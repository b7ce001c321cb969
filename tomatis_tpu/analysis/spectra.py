"""Batched spectral statistics shared by the EQ analyzer and comparators
(ref src/layer2_analyze_eq.py:54-88, src/compare_audio.py:12-29).

All per-frame FFT loops of the reference run as one device op over the
framed mono-power signal.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tomatis_tpu.analysis.align import EPS, power_mono
from tomatis_tpu.ops import stft


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "n_frames"))
def _frame_logpower(mono, n_fft, hop, n_frames):
    win = jnp.asarray(stft.hann_symmetric(n_fft))
    fr = stft.frame_signal(mono[:, None], n_fft, hop, n_frames)[:, 0, :]
    r = jnp.sqrt(jnp.mean(jnp.square(fr), axis=-1) + EPS)
    levels = 20.0 * jnp.log10(r + EPS)
    X = jnp.fft.rfft(fr * win)
    P = (X.real * X.real + X.imag * X.imag).astype(jnp.float32)
    return levels, 10.0 * jnp.log10(P + EPS)


def logpower_median(x_lr: np.ndarray, sr: int, n_fft: int, hop: int,
                    music_dbfs: float):
    """Median log-power spectrum over music frames (level > music_dbfs),
    computed on the power-mono signal (ref layer2_analyze_eq.py:54-88).
    Returns (freqs, median_db [bins], used_frames)."""
    mono = power_mono(x_lr)
    n_frames = 1 + (len(mono) - n_fft) // hop
    if n_frames <= 10:
        raise ValueError("segment too short for stable spectral statistics")
    levels, logp = _frame_logpower(jnp.asarray(mono), n_fft, hop, n_frames)
    levels = np.asarray(levels)
    logp = np.asarray(logp)
    used = levels > music_dbfs
    n_used = int(used.sum())
    if n_used < 50:
        raise ValueError(f"too few music frames ({n_used}); lower music_dbfs")
    med = np.median(logp[used], axis=0).astype(np.float32)
    freqs = stft.rfft_freqs(n_fft, sr)
    return freqs, med, n_used


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "n_frames"))
def _frame_mag_mean(mono, n_fft, hop, n_frames):
    win = jnp.asarray(stft.hann_symmetric(n_fft))
    fr = stft.frame_signal(mono[:, None], n_fft, hop, n_frames)[:, 0, :]
    return jnp.mean(jnp.abs(jnp.fft.rfft(fr * win)), axis=0)


def mag_avg(mono: np.ndarray, n_fft: int = 4096, hop: int = 2048):
    """Mean magnitude spectrum over all frames (ref compare_audio.py:12-24)."""
    n_frames = 1 + (len(mono) - n_fft) // hop
    return np.asarray(_frame_mag_mean(jnp.asarray(np.asarray(mono, np.float32)),
                                      n_fft, hop, n_frames))


def band_energy(mag: np.ndarray, freqs: np.ndarray, f1: float, f2: float):
    m = (freqs >= f1) & (freqs < f2)
    return float(np.mean(np.asarray(mag)[m] ** 2) + EPS)


def anchored_delta(delta: np.ndarray, freqs: np.ndarray, anchor_lo: float,
                   anchor_hi: float, clamp_db: float):
    """Remove the anchor-band median and clamp (ref layer2_analyze_eq.py
    :137-144). Returns (delta0, anchor)."""
    mask = (freqs >= anchor_lo) & (freqs <= anchor_hi)
    anchor = float(np.median(delta[mask]))
    return np.clip(delta - anchor, -clamp_db, clamp_db).astype(np.float32), \
        anchor
