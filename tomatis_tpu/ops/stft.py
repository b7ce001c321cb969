"""Framed STFT filter-bank + overlap-add as batched XLA ops.

The reference's hot loop processes one 4096-sample frame at a time in Python
(ref src/process_tomatis.py:359-426: rfft -> per-bin gain -> irfft -> window
-> OLA accumulate). Here all frames of a chunk are one tensor:

    frames [F, C, n_fft] --rfft--> [F, C, bins] --*gain--> --irfft*win-->
    y [F, C, n_fft] --overlap-add--> [ (F-1)*hop + n_fft, C ]

so the FFTs batch onto the TPU in a single XLA op and the OLA is a K-way
shifted add (K = n_fft/hop) instead of a scatter.

Window convention: the processors use the *symmetric* Hann window
(np.hanning, ref src/process_tomatis.py:266); the three-way comparator uses
the periodic one (ref src/compare_three.py:107). Both are provided.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_symmetric(n_fft: int) -> np.ndarray:
    """np.hanning equivalent: w[k] = 0.5 - 0.5*cos(2*pi*k/(n-1)), float32."""
    return np.hanning(n_fft).astype(np.float32)


def hann_periodic(n_fft: int) -> np.ndarray:
    """scipy.signal.get_window('hann', n, fftbins=True) equivalent."""
    k = np.arange(n_fft)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / n_fft)).astype(np.float32)


def num_frames(n_samples: int, n_fft: int, hop: int) -> int:
    """Number of frames the reference loop emits over a buffer of n_samples:
    frames start at 0, hop, ... while start + n_fft <= n_samples."""
    if n_samples < n_fft:
        return 0
    return (n_samples - n_fft) // hop + 1


def pad_end(n_samples: int, n_fft: int, hop: int) -> int:
    """Reference tail zero-padding so the last samples are frame-covered:
    (hop - ((N - n_fft) % hop)) % hop  (ref src/process_tomatis.py:272).
    N is a SAMPLE count."""
    return (hop - ((n_samples - n_fft) % hop)) % hop


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "n_frames"))
def frame_signal(x, n_fft: int, hop: int, n_frames: int):
    """Extract overlapping frames.

    x: [S, C] with S >= (n_frames-1)*hop + n_fft. Returns [F, C, n_fft].
    When hop divides n_fft this is K stacked slices (no gather); otherwise a
    single gather.
    """
    if n_fft % hop == 0:
        k = n_fft // hop
        n_blocks = n_frames + k - 1
        blocks = x[: n_blocks * hop].reshape(n_blocks, hop, -1)
        # frame f = concat(blocks[f : f+k]) along time
        parts = [blocks[i:i + n_frames] for i in range(k)]
        frames = jnp.concatenate(parts, axis=1)            # [F, n_fft, C]
    else:
        idx = (jnp.arange(n_frames)[:, None] * hop
               + jnp.arange(n_fft)[None, :])               # [F, n_fft]
        frames = x[idx]                                    # [F, n_fft, C]
    return jnp.transpose(frames, (0, 2, 1))                # [F, C, n_fft]


def apply_gain_bank(frames, win, gains):
    """Window -> rFFT -> per-bin gain -> irFFT -> window, batched.

    frames: [F, C, n_fft]; win: [n_fft]; gains: [F, bins] or [bins] (real).
    Returns y: [F, C, n_fft] float32.
    Mirrors ref src/process_tomatis.py:394-398 per frame/channel.
    """
    n_fft = frames.shape[-1]
    X = jnp.fft.rfft(frames * win)                         # [F, C, bins]
    if gains.ndim == 1:
        Y = X * gains
    else:
        Y = X * gains[:, None, :]
    y = jnp.fft.irfft(Y, n=n_fft).astype(jnp.float32) * win
    return y


@functools.partial(jax.jit, static_argnames=("hop",))
def overlap_add(y, hop: int):
    """Overlap-add frames y [F, C, n_fft] at the given hop.

    Returns out [(F-1)*hop + n_fft, C]. On TPU with hop | n_fft the K-way
    gather runs as a Pallas kernel (one VMEM pass per output tile,
    ops/pallas_ola.py); elsewhere the XLA fast path does K shifted adds,
    and the general case falls back to a scatter-add.
    """
    F, C, n_fft = y.shape
    L = (F - 1) * hop + n_fft
    if n_fft % hop == 0:
        from tomatis_tpu.ops.pallas_ola import (overlap_add_pallas,
                                                pallas_available)
        if pallas_available():
            return overlap_add_pallas(y, hop)[:L]
        k = n_fft // hop
        yb = y.reshape(F, C, k, hop)
        out = jnp.zeros((F + k - 1, C, hop), jnp.float32)
        for i in range(k):
            out = out.at[i:i + F].add(yb[:, :, i, :])
        return jnp.transpose(out, (0, 2, 1)).reshape((F + k - 1) * hop, C)[:L]
    idx = (jnp.arange(F)[:, None] * hop + jnp.arange(n_fft)[None, :]).reshape(-1)
    flat = jnp.transpose(y, (0, 2, 1)).reshape(-1, C)
    return jnp.zeros((L, C), jnp.float32).at[idx].add(flat)


@functools.partial(jax.jit, static_argnames=("n_frames", "hop"))
def window_ola(win2, n_frames: int, hop: int):
    """Overlap-added window-square envelope (the OLA normalizer), [L]."""
    y = jnp.broadcast_to(win2, (n_frames, 1, win2.shape[0]))
    return overlap_add(y, hop)[:, 0]


def rfft_freqs(n_fft: int, sr: float) -> np.ndarray:
    return np.fft.rfftfreq(n_fft, d=1.0 / sr).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "n_frames"))
def frame_levels_chunk(sig, n_fft: int, hop: int, n_frames: int):
    """Per-frame RMS dBFS of a [S, C] signal slice — module-level jit so
    repeated calls share one compiled executable."""
    from tomatis_tpu.ops.dsp import frame_levels_dbfs
    frames = frame_signal(sig, n_fft, hop, n_frames)
    return frame_levels_dbfs(jnp.transpose(frames, (0, 2, 1)))
