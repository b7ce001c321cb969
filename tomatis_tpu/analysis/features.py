"""Frame features + clustering for calibration (ref
src/calibrate_to_baseline.py:6-43, src/calibrate_to_baseline_v2.py).

The per-frame loop of the reference (level + band-tilt per frame) is one
batched device op here: all frames -> rFFT -> band energies in one shot.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tomatis_tpu.analysis.align import EPS
from tomatis_tpu.ops import stft


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "n_frames",
                                             "sr", "lo", "hi"))
def _frame_features(xo, xb, n_fft, hop, n_frames, sr, lo, hi):
    win = jnp.asarray(stft.hann_symmetric(n_fft))
    freqs = jnp.asarray(stft.rfft_freqs(n_fft, sr))

    def mono_frames(x):
        fr = stft.frame_signal(x, n_fft, hop, n_frames)   # [F, C, n_fft]
        return jnp.sqrt(jnp.mean(jnp.square(fr), axis=1) + EPS)  # [F, n_fft]

    mo = mono_frames(xo)
    mb = mono_frames(xb)

    def level(m):
        r = jnp.sqrt(jnp.mean(jnp.square(m), axis=-1) + EPS)
        return 20.0 * jnp.log10(r + EPS)

    X = jnp.fft.rfft(mb * win)                            # [F, bins]
    P = (X.real * X.real + X.imag * X.imag).astype(jnp.float32)
    lo_m = (freqs >= lo[0]) & (freqs < lo[1])
    hi_m = (freqs >= hi[0]) & (freqs < hi[1])
    e_lo = jnp.sum(jnp.where(lo_m, P, 0.0), axis=-1) + EPS
    e_hi = jnp.sum(jnp.where(hi_m, P, 0.0), axis=-1) + EPS
    tilt = 10.0 * jnp.log10(e_hi / e_lo + EPS)
    return level(mo), level(mb), tilt


def frame_features(xo: np.ndarray, xb: np.ndarray, sr: int, n_fft: int,
                   hop: int, lo=(200, 1000), hi=(2000, 8000)):
    """Per-frame (orig level, base level, base band tilt), batched.
    Frames start at 0, hop, ... while start + n_fft <= len."""
    avail = min(len(xo), len(xb))
    n_frames = 1 + (avail - n_fft) // hop
    xo_j = jnp.asarray(xo[:avail], jnp.float32)
    xb_j = jnp.asarray(xb[:avail], jnp.float32)
    ol, bl, tl = _frame_features(xo_j, xb_j, n_fft, hop, n_frames, sr,
                                 tuple(lo), tuple(hi))
    starts = (np.arange(n_frames) * hop).astype(np.int64)
    return np.asarray(ol), np.asarray(bl), np.asarray(tl), starts


def kmeans2_1d(x: np.ndarray, iters: int = 20):
    """Tiny 1-D 2-means (ref calibrate_to_baseline.py:31-43)."""
    m1, m2 = np.percentile(x, [30, 70]).astype(float)
    for _ in range(iters):
        d1 = np.abs(x - m1)
        d2 = np.abs(x - m2)
        c1 = x[d1 <= d2]
        c2 = x[d1 > d2]
        if len(c1) > 0:
            m1 = float(np.mean(c1))
        if len(c2) > 0:
            m2 = float(np.mean(c2))
    lab = (np.abs(x - m2) < np.abs(x - m1)).astype(np.int32)
    return lab, m1, m2


def tilt_to_states(tilts: np.ndarray) -> np.ndarray:
    """Cluster tilt into C1/C2; higher tilt => C2 (brighter)."""
    lab, m1, m2 = kmeans2_1d(tilts)
    mean0 = float(np.mean(tilts[lab == 0])) if np.any(lab == 0) else -1e9
    mean1 = float(np.mean(tilts[lab == 1])) if np.any(lab == 1) else -1e9
    hot = 1 if mean1 > mean0 else 0
    return np.where(lab == hot, 2, 1).astype(np.int32)


def debounce_state(state: np.ndarray, min_run: int = 3) -> np.ndarray:
    """Absorb runs shorter than min_run into the left neighbor
    (ref calibrate_to_baseline_v2.py:111-128)."""
    s = state.copy()
    n = len(s)
    i = 0
    while i < n:
        j = i + 1
        while j < n and s[j] == s[i]:
            j += 1
        if j - i < min_run:
            left = s[i - 1] if i > 0 else (s[j] if j < n else s[i])
            s[i:j] = left
        i = j
    return s
