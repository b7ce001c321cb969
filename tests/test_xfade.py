"""Crossfade processor parity vs oracle (alpha ramp + dB-domain blend)."""
import numpy as np

from tests.oracle import refdsp
from tomatis_tpu.models.xfade import XfadeParams, process_array


def _signal(seconds=3.0, sr=48000):
    n = int(seconds * sr)
    t = np.arange(n) / sr
    env = 0.004 + 0.3 * (np.sin(2 * np.pi * 0.9 * t) > 0)
    x = env * np.sin(2 * np.pi * 600 * t)
    return np.stack([x, 0.9 * x], 1).astype(np.float32)


def _oracle_xfade(x, sr, p: XfadeParams):
    """Loop-based crossfade reference (src/process_tomatis_xfade.py)."""
    total, ch = x.shape
    n_fft, hop = p.n_fft, p.hop
    T = p.threshold_dbfs()
    ton, toff = T + p.hysteresis_db / 2, T - p.hysteresis_db / 2
    pad = n_fft // 2
    pad_end = (hop - ((total - n_fft) % hop)) % hop
    xp = np.concatenate([np.zeros((pad, ch), np.float32), x,
                         np.zeros((pad_end, ch), np.float32)])
    F = (len(xp) - n_fft) // hop + 1
    freqs = np.fft.rfftfreq(n_fft, 1 / sr)
    g1_db = refdsp.tilt_gain_db(freqs, p.fc, p.slope, p.c1_low, p.c1_high)
    g2_db = refdsp.tilt_gain_db(freqs, p.fc, p.slope, p.c2_low, p.c2_high)
    g1, g2 = refdsp.db_to_lin(g1_db), refdsp.db_to_lin(g2_db)
    xf = p.xfade_frames(sr)
    step = 1.0 / xf if xf > 0 else 1.0
    levels = []
    for j in range(F):
        fr = xp[j * hop:j * hop + n_fft]
        levels.append(refdsp.rms_dbfs(
            np.sqrt(np.mean(fr.astype(np.float64) ** 2, axis=1))))
    states = refdsp.gate_updelay_loop(
        np.array(levels), ton, toff, int(sr * p.up_delay_ms / 1000), hop,
        start0=-pad)
    alpha = np.zeros(F)
    cur = 0.0
    for j in range(F):
        tgt = 0.0 if states[j] == 1 else 1.0
        if xf > 0:
            d = tgt - cur
            cur = tgt if abs(d) <= step else cur + step * np.sign(d)
        else:
            cur = tgt
        alpha[j] = cur
    gains = np.zeros((F, len(freqs)))
    for j in range(F):
        a = alpha[j]
        if p.xfade_ms > 0 and 0 < a < 1:
            gains[j] = refdsp.db_to_lin((1 - a) * g1_db + a * g2_db)
        else:
            gains[j] = g1 if a < 0.5 else g2
    ysum, wsum = refdsp.stft_ola_loop(xp, gains, n_fft, hop)
    y = (ysum / (wsum[:, None] + refdsp.EPS))[pad:pad + total]
    peak = np.max(np.abs(y))
    if peak > refdsp.PEAK_LIMIT:  # short files: single flush
        y = y * (refdsp.PEAK_LIMIT / peak)
    return y.astype(np.float32), states, alpha


def test_xfade_parity():
    sr = 48000
    x = _signal(3.0)
    p = XfadeParams(gate_ui=60.0, xfade_ms=120.0, require_48k_stereo=False)
    y, stats = process_array(x, sr, p, frames_per_chunk=23)
    y_ref, states_ref, alpha_ref = _oracle_xfade(x, sr, p)
    assert y.shape == x.shape
    assert stats["c2_frames"] == int(np.sum(states_ref == 2))
    assert np.max(np.abs(y - y_ref)) < 2e-4


def test_hard_switch_equals_standard():
    """xfade_ms=0 must reproduce the standard processor exactly (with the
    linear gate mapping)."""
    from tomatis_tpu.models.standard import StandardParams
    from tomatis_tpu.models.standard import process_array as std_process
    sr = 48000
    x = _signal(2.0)
    px = XfadeParams(gate_ui=60.0, xfade_ms=0.0, require_48k_stereo=False)
    ps = StandardParams(gate_ui=60.0, gate_mode="linear",
                        require_48k_stereo=False)
    yx, _ = process_array(x, sr, px)
    ys, _ = std_process(x, sr, ps)
    np.testing.assert_allclose(yx, ys, atol=1e-5)


def test_alpha_ramp_duration():
    """Alpha must take ~xfade_frames frames to traverse 0 -> 1."""
    sr = 48000
    n = 2 * sr
    t = np.arange(n) / sr
    x = np.where(t > 0.8, 0.3, 0.002)[:, None] * np.sin(2 * np.pi * 700 * t)[:, None]
    x = np.repeat(x, 2, 1).astype(np.float32)
    p = XfadeParams(gate_ui=60.0, xfade_ms=200.0, up_delay_ms=0.0,
                    require_48k_stereo=False)
    from tomatis_tpu.models.xfade import make_runner
    runner = make_runner(p, sr, 2, n)
    alphas = []
    runner.run(x, on_frames=lambda f0, st, log: alphas.extend(log["alpha"]))
    alphas = np.array(alphas)
    frac = np.flatnonzero((alphas > 0) & (alphas < 1))
    xf = p.xfade_frames(sr)
    assert xf - 1 <= len(frac) <= xf  # ramp occupies the crossfade window


def test_xfade_transport_param(tmp_path):
    """process(transport=...) on the crossfade processor: wire and pcm24
    byte-identical, f32 within one PCM_24 LSB."""
    import numpy as np
    from tomatis_tpu.io import audio
    from tomatis_tpu.models.xfade import XfadeParams, process
    sr = 48000
    t = np.arange(2 * sr) / sr
    env = np.where((t > 0.6) & (t < 1.4), 0.08, 0.003)
    x = (env * np.sin(2 * np.pi * 900 * t)).astype(np.float32)
    ip = tmp_path / "in.wav"
    audio.write(ip, np.stack([x, x], 1), sr, subtype="FLOAT")
    p = XfadeParams(require_48k_stereo=False)
    outs = {}
    for tr in ("wire", "pcm24", "f32"):
        op = tmp_path / f"o_{tr}.wav"
        process(ip, op, p, frames_per_chunk=32, transport=tr)
        outs[tr], _ = audio.read(op)
    np.testing.assert_array_equal(outs["wire"], outs["pcm24"])
    assert np.max(np.abs(outs["f32"] - outs["pcm24"])) <= 1.5 / 8388608.0
