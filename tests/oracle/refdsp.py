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


def process_standard_loop(x, sr, gate_ui=50.0, gate_mode="log_percent",
                          dynamic_range=80.0, gate_scale=1.0,
                          gate_offset=-100.0, hysteresis_db=3.0,
                          up_delay_ms=250.0, fc=1000.0, slope=12.0,
                          c1_low=15.0, c1_high=-15.0, c2_low=-15.0,
                          c2_high=15.0, n_fft=4096, hop=2048,
                          output_gain_db=0.0, flush_threshold=48000 * 5):
    """Full standard-processor oracle (src/process_tomatis.py:160-479):
    padded frame loop, variant-A gate, STFT filter, OLA, >=5 s flushes with
    per-flush peak clamp to 0.999. Returns (y [N,C], states, csv_rows)."""
    x = np.asarray(x, np.float32)
    if x.ndim == 1:
        x = x[:, None]
    total, ch = x.shape
    if gate_mode == "log_percent":
        T = -dynamic_range + dynamic_range * gate_ui / 100.0
    else:
        T = gate_scale * gate_ui + gate_offset
    ton = T + hysteresis_db / 2.0
    toff = T - hysteresis_db / 2.0
    up_delay_samples = int(sr * up_delay_ms / 1000.0)

    freqs = np.fft.rfftfreq(n_fft, d=1.0 / sr)
    g1 = db_to_lin(tilt_gain_db(freqs, fc, slope, c1_low, c1_high))
    g2 = db_to_lin(tilt_gain_db(freqs, fc, slope, c2_low, c2_high))
    win = np.hanning(n_fft).astype(np.float32)
    win2 = (win * win).astype(np.float32)

    pad = n_fft // 2
    pad_end = (hop - ((total - n_fft) % hop)) % hop
    xp = np.concatenate([np.zeros((pad, ch), np.float32), x,
                         np.zeros((pad_end, ch), np.float32)])
    n_frames = (len(xp) - n_fft) // hop + 1

    out_buf = np.zeros((0, ch), np.float32)
    w_buf = np.zeros((0,), np.float32)
    out_base = -pad
    written = []
    gain_lin = 10.0 ** (output_gain_db / 20.0)

    def write_clamped(y_chunk, abs_start):
        s = max(0, abs_start)
        e = min(total, abs_start + len(y_chunk))
        if e <= s:
            return
        out = y_chunk[s - abs_start:e - abs_start]
        if output_gain_db != 0.0:
            out = out * gain_lin
        peak = np.max(np.abs(out))
        if peak > PEAK_LIMIT:
            out = out * (PEAK_LIMIT / peak)
        written.append(out.astype(np.float32))

    state = 1
    pending_at = None
    states = []
    csv_rows = []
    for j in range(n_frames):
        start = -pad + j * hop
        frame = xp[j * hop: j * hop + n_fft, :]
        mono = np.sqrt(np.mean(frame.astype(np.float64) ** 2, axis=1))
        level = rms_dbfs(mono)
        if state == 1:
            if level >= ton:
                if pending_at is None:
                    pending_at = start + up_delay_samples
            else:
                pending_at = None
            if pending_at is not None and start >= pending_at:
                state = 2
                pending_at = None
        else:
            if level <= toff:
                state = 1
                pending_at = None
        states.append(state)
        gain = g1 if state == 1 else g2

        need = (start + n_fft) - out_base
        if need > len(w_buf):
            grow = need - len(w_buf)
            out_buf = np.concatenate([out_buf, np.zeros((grow, ch), np.float32)])
            w_buf = np.concatenate([w_buf, np.zeros((grow,), np.float32)])
        orel = start - out_base
        y = np.zeros((n_fft, ch), np.float32)
        for c in range(ch):
            X = np.fft.rfft(frame[:, c] * win)
            X = X * gain
            y[:, c] = np.fft.irfft(X, n=n_fft).astype(np.float32) * win
        out_buf[orel:orel + n_fft] += y
        w_buf[orel:orel + n_fft] += win2
        if 0 <= start < total:
            csv_rows.append((j, start / sr, level, "C1" if state == 1 else "C2"))

        next_start = start + hop
        safe = (next_start - out_base) - n_fft
        if safe >= flush_threshold:
            n = safe
            write_clamped(out_buf[:n] / (w_buf[:n, None] + EPS), out_base)
            out_base += n
            out_buf = out_buf[n:]
            w_buf = w_buf[n:]

    if len(w_buf) > 0:
        write_clamped(out_buf / (w_buf[:, None] + EPS), out_base)
    y = np.concatenate(written, 0) if written else np.zeros((0, ch), np.float32)
    return y, np.array(states, np.int32), csv_rows
