"""Core DSP primitives (L0 of the reference's layer map).

Pure JAX functions, shape-polymorphic and jit-safe. Numerical semantics follow
the reference implementations exactly (same EPS idioms, same plateau
construction), at float32 precision:

- rms_dbfs / power_mono:      reference src/process_tomatis.py:43-52
- gate_ui_to_dbfs:            reference src/process_tomatis.py:54-80
- gate_ui_to_dbfs_log_percent reference src/process_tomatis.py:82-103
- db_to_lin:                  reference src/process_tomatis.py:105-107
- build_tilt_gain_db:         reference src/process_tomatis.py:109-158
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

EPS = 1e-12
PEAK_LIMIT = 0.999


def db_to_lin(db):
    """dB -> linear amplitude gain, float32 (ref src/process_tomatis.py:105-107)."""
    return (10.0 ** (jnp.asarray(db) / 20.0)).astype(jnp.float32)


def lin_to_db(lin, eps: float = EPS):
    """Linear amplitude -> dB with the reference's epsilon guard."""
    return 20.0 * jnp.log10(jnp.asarray(lin) + eps)


def power_mono(frame):
    """Stereo (or N-channel) frame -> mono by power average.

    frame: [..., n, ch]. Returns [..., n]. The reference computes
    ``mono = sqrt(mean(frame**2, axis=1))`` (src/process_tomatis.py:370);
    waveform averaging (L+R)/2 would underestimate energy on out-of-phase
    content (src/process_tomatis.py:47-49).
    """
    return jnp.sqrt(jnp.mean(jnp.square(frame), axis=-1))


def rms_dbfs(x_mono, eps: float = EPS):
    """RMS level in dBFS of a mono frame (ref src/process_tomatis.py:43-52).

    Keeps the reference's double-epsilon idiom:
        r = sqrt(mean(x^2) + EPS);  level = 20*log10(r + EPS)
    x_mono: [..., n]; reduces over the last axis.
    """
    r = jnp.sqrt(jnp.mean(jnp.square(x_mono), axis=-1) + eps)
    return 20.0 * jnp.log10(r + eps)


def frame_levels_dbfs(frames, eps: float = EPS):
    """Per-frame RMS dBFS of multichannel frames [..., n, ch].

    Equivalent to rms_dbfs(power_mono(frames)) but fused:
    mean_t(mean_c(x^2)) is the same scalar either way.
    """
    m = jnp.mean(jnp.square(frames), axis=(-2, -1)) + eps
    return 20.0 * jnp.log10(jnp.sqrt(m) + eps)


def gate_ui_to_dbfs(gate_ui, gate_scale: float = 1.0, gate_offset: float = -100.0):
    """Linear UI->dBFS gate mapping: T = scale*ui + offset
    (ref src/process_tomatis.py:54-80)."""
    return gate_scale * gate_ui + gate_offset


def gate_ui_to_dbfs_log_percent(gate_ui, dynamic_range: float = 80.0):
    """Log-percent UI->dBFS gate mapping: T = -DR + DR*ui/100
    (ref src/process_tomatis.py:82-103)."""
    return -dynamic_range + dynamic_range * gate_ui / 100.0


def build_tilt_gain_db(freqs, fc, slope_db_per_oct, low_gain_db, high_gain_db):
    """Tilt gain curve in dB, 0 dB pivot at fc (ref src/process_tomatis.py:109-158).

    Each side ramps from 0 dB at fc toward its plateau at `slope` dB/octave and
    clamps there:
        x = log2(max(f,1)/fc)
        low  side (x<0): g = sign(g_lo) * min(slope*|x|, |g_lo|)
        high side (x>0): g = sign(g_hi) * min(slope* x , |g_hi|)
    The bin(s) where x == 0 (and f<=1 Hz bins mapping to x<0 stay on the low
    side) keep g = 0, matching the reference's masked assignment. A single
    clip(low, high) is deliberately NOT used: it breaks when low_db > high_db
    (ref src/process_tomatis.py:142).

    freqs may be a numpy or jax array; result is float32 with freqs' backend.
    """
    xp = jnp if isinstance(freqs, jnp.ndarray) else np
    f = xp.maximum(xp.asarray(freqs, dtype=xp.float32), 1.0)
    x = xp.log2(f / fc).astype(xp.float32)

    d_low = slope_db_per_oct * xp.maximum(0.0, -x)
    g_low = xp.sign(low_gain_db) * xp.minimum(d_low, abs(low_gain_db))
    d_hi = slope_db_per_oct * xp.maximum(0.0, x)
    g_hi = xp.sign(high_gain_db) * xp.minimum(d_hi, abs(high_gain_db))

    g = xp.where(x < 0, g_low, xp.where(x > 0, g_hi, 0.0))
    return g.astype(xp.float32)


def tilt_platform_freqs(fc, slope, low_gain_db, high_gain_db):
    """Plateau start frequencies (ref src/process_tomatis.py:138-140):
    f_lo = fc * 2^(-|G_lo|/slope),  f_hi = fc * 2^(|G_hi|/slope)."""
    f_lo = fc * 2.0 ** (-abs(low_gain_db) / slope)
    f_hi = fc * 2.0 ** (abs(high_gain_db) / slope)
    return f_lo, f_hi


def tilt_index_db(spec_power, freqs, lo_band=(200.0, 1000.0), hi_band=(2000.0, 8000.0),
                  eps: float = EPS):
    """Tilt Index: 10*log10(E(2-8k)/E(200-1k)) over a power spectrum
    (ref src/verify_tomatis_15db.py:371-460, src/calibrate_to_baseline.py:15-29).

    spec_power: [..., nbins] power spectrum; freqs: [nbins].
    """
    freqs = jnp.asarray(freqs)
    lo_m = (freqs >= lo_band[0]) & (freqs < lo_band[1])
    hi_m = (freqs >= hi_band[0]) & (freqs < hi_band[1])
    e_lo = jnp.sum(jnp.where(lo_m, spec_power, 0.0), axis=-1)
    e_hi = jnp.sum(jnp.where(hi_m, spec_power, 0.0), axis=-1)
    return 10.0 * jnp.log10((e_hi + eps) / (e_lo + eps))
