"""NumPy oracle: a fresh, loop-based transcription of the reference
semantics (xyjk0511/tomatis-audio-processor) used ONLY to parity-test the
TPU-native implementations. Deliberately written the slow/obvious way.

Key sources:
  src/process_tomatis.py            (standard processor + primitives)
  src/process_tomatis_xfade.py      (crossfade alpha ramp)
  src/process_tomatis_adaptive.py   (min-hold gate, adaptive pipeline)
"""
from __future__ import annotations

import numpy as np

EPS = 1e-12
PEAK_LIMIT = 0.999


def rms_dbfs(x):
    r = np.sqrt(np.mean(x * x) + EPS)
    return float(20.0 * np.log10(r + EPS))


def db_to_lin(db):
    return 10.0 ** (np.asarray(db, dtype=np.float64) / 20.0)


def tilt_gain_db(freqs, fc, slope, low_db, high_db):
    f = np.maximum(np.asarray(freqs, np.float64), 1.0)
    x = np.log2(f / fc)
    g = np.zeros_like(x)
    lo = np.sign(low_db) * np.minimum(slope * np.maximum(0.0, -x), abs(low_db))
    hi = np.sign(high_db) * np.minimum(slope * np.maximum(0.0, x), abs(high_db))
    g[x < 0] = lo[x < 0]
    g[x > 0] = hi[x > 0]
    return g


def gate_updelay_loop(levels, ton, toff, up_delay_samples, hop, start0=0):
    """Reference variant-A state machine: per-frame loop with absolute
    sample coordinates (src/process_tomatis.py:373-385)."""
    state = 1
    pending_at = None
    states = []
    next_start = start0
    for level in levels:
        if state == 1:
            if level >= ton:
                if pending_at is None:
                    pending_at = next_start + up_delay_samples
            else:
                pending_at = None
            if pending_at is not None and next_start >= pending_at:
                state = 2
                pending_at = None
        else:
            if level <= toff:
                state = 1
                pending_at = None
        states.append(state)
        next_start += hop
    return np.array(states, np.int32)


def gate_minhold_loop(levels, threshold, hyst_db=3.0, min_hold_frames=6):
    """Reference variant-B state machine (src/process_tomatis_adaptive.py:87-121)."""
    ton = threshold + hyst_db / 2
    toff = threshold - hyst_db / 2
    state = 1
    states = []
    since = min_hold_frames
    for level in levels:
        since += 1
        if since >= min_hold_frames:
            if state == 1:
                if level >= ton:
                    state = 2
                    since = 0
            else:
                if level <= toff:
                    state = 1
                    since = 0
        states.append(state)
    return np.array(states, np.int32)


def alpha_ramp_loop(targets, step, alpha0=0.0):
    """Reference crossfade ramp (src/process_tomatis_xfade.py:254-262):
    returns alpha after each frame's update."""
    cur = alpha0
    out = []
    for t in targets:
        diff = t - cur
        if abs(diff) <= step:
            cur = t
        else:
            cur = cur + step * np.sign(diff)
        out.append(cur)
    return np.array(out, np.float64)


def stft_ola_loop(x, gains_per_frame, n_fft, hop, win=None):
    """Whole-signal framed filter + OLA, reference style but one-shot.

    x: [S, C] already padded as the caller wishes; frames start at 0, hop,...
    gains_per_frame: [F, bins] linear gain per frame.
    Returns (y_sum [S', C], wsum [S']) where S' = (F-1)*hop + n_fft.
    """
    if win is None:
        win = np.hanning(n_fft).astype(np.float32)
    win2 = (win * win).astype(np.float32)
    F = gains_per_frame.shape[0]
    C = x.shape[1]
    L = (F - 1) * hop + n_fft
    y_sum = np.zeros((L, C), np.float64)
    wsum = np.zeros(L, np.float64)
    for f in range(F):
        frame = x[f * hop: f * hop + n_fft, :]
        for c in range(C):
            X = np.fft.rfft(frame[:, c] * win)
            X = X * gains_per_frame[f]
            y = np.fft.irfft(X, n=n_fft).astype(np.float32) * win
            y_sum[f * hop: f * hop + n_fft, c] += y
        wsum[f * hop: f * hop + n_fft] += win2
    return y_sum, wsum
