"""Layer-2 / 2b EQ applier parity tests."""
import csv

import numpy as np

from tests.oracle import refdsp
from tomatis_tpu.io import audio
from tomatis_tpu.models import eq as eqm


def _tone(seconds=2.0, sr=48000, amp=0.2):
    n = int(seconds * sr)
    t = np.arange(n) / sr
    x = amp * (np.sin(2 * np.pi * 400 * t) + np.sin(2 * np.pi * 5000 * t))
    return np.stack([x, 0.9 * x], 1).astype(np.float32)


def _oracle_apply(x, gain_bins, n_fft, hop, pad_len, pre_gain=1.0):
    """Uncropped stream oracle (ref src/layer2_apply_eq.py:103-215)."""
    ch = x.shape[1]
    xg = (x * pre_gain).astype(np.float32)
    xp = np.concatenate([np.zeros((pad_len, ch), np.float32), xg,
                         np.zeros((pad_len, ch), np.float32)])
    F = (len(xp) - n_fft) // hop + 1
    ys, ws = refdsp.stft_ola_loop(xp, np.broadcast_to(
        gain_bins, (F, len(gain_bins))), n_fft, hop)
    return (ys / (ws[:, None] + refdsp.EPS)).astype(np.float32)


def _write_eq_csv(path, freqs, dbs, fcol="freq_hz", dcol="delta_db_smooth"):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([fcol, dcol])
        for fr, db in zip(freqs, dbs):
            w.writerow([fr, db])


def test_build_gain_per_bin_logf_interp():
    freqs = np.array([100.0, 1000.0, 10000.0])
    dbs = np.array([-6.0, 0.0, 6.0])
    g = eqm.build_gain_per_bin(48000, 1024, freqs, dbs)
    f_bins = np.fft.rfftfreq(1024, 1 / 48000)
    # at 1 kHz the gain is 0 dB; geometric midpoint ~316 Hz -> -3 dB
    i1k = np.argmin(np.abs(f_bins - 1000))
    np.testing.assert_allclose(20 * np.log10(g[i1k]), 0.0, atol=0.1)
    i316 = np.argmin(np.abs(f_bins - 316.2))
    np.testing.assert_allclose(20 * np.log10(g[i316]), -3.0, atol=0.15)
    # clamped outside [100, 10000]
    assert abs(20 * np.log10(g[1]) - (-6.0)) < 1e-3


def test_apply_eq_matches_oracle(tmp_path):
    sr = 48000
    # quiet: even the w~0 boundary spikes stay under the 0.99 protect
    # threshold (the reference's peak_seen includes them too)
    x = _tone(2.0, amp=0.04)
    ip = tmp_path / "in.wav"
    audio.write(ip, x, sr, subtype="FLOAT")
    csvp = tmp_path / "eq.csv"
    _write_eq_csv(csvp, [50, 500, 2000, 8000, 20000], [3, 2, -1, -4, -6])
    op = tmp_path / "out.wav"
    res = eqm.apply_eq(ip, op, csvp, frames_per_chunk=17)
    y, _ = audio.read(res["out_path"])
    g = eqm.build_gain_per_bin(sr, 4096, *eqm.load_eq_csv(csvp))
    y_ref = _oracle_apply(x, g, 4096, 2048, 2048)
    assert len(y) == len(y_ref)  # uncropped: includes pad + tail
    # PCM_24 encoding clips the blown-up w~0 boundary samples to full scale
    # in the file — exactly as the reference's PCM_24 output does.
    y_ref = np.clip(y_ref, -1.0, 8388607 / 8388608.0)
    d = np.abs(y - y_ref)
    # boundary samples divide by w ~ 0, amplifying f32-vs-f64 noise
    assert np.max(d[2048:-2048]) < 3e-4
    assert np.max(d) < 5e-3
    assert res["gain_protected_path"] is None


def test_apply_eq_gain_protect(tmp_path):
    sr = 48000
    x = _tone(1.0, amp=0.45)
    ip = tmp_path / "in.wav"
    audio.write(ip, x, sr, subtype="FLOAT")
    csvp = tmp_path / "eq.csv"
    _write_eq_csv(csvp, [100, 10000], [8, 8])  # +8 dB everywhere -> clip
    op = tmp_path / "out.wav"
    res = eqm.apply_eq(ip, op, csvp)
    assert res["peak_seen"] > 0.99
    assert res["gain_protected_path"] is not None
    ygp, _ = audio.read(res["gain_protected_path"])
    assert np.max(np.abs(ygp)) <= 0.992


def test_residual_eq_clamps():
    freqs = np.fft.rfftfreq(4096, 1 / 48000)
    rf = np.array([100.0, 20000.0])
    rd = np.array([10.0, 10.0])
    lin, db = eqm.build_eq_from_residual(freqs, rf, rd)
    assert np.max(db[(freqs >= 100) & (freqs < 3000)]) <= 6.0 + 1e-6
    assert np.max(db[(freqs >= 3000) & (freqs < 8000)]) <= 2.0 + 1e-6
    assert np.max(db[freqs >= 8000]) <= 0.0 + 1e-6
    lin_s, db_s = eqm.build_eq_from_residual_safe(freqs, rf, rd)
    assert np.max(db_s) <= 1.0 + 1e-6
    np.testing.assert_array_equal(db_s[freqs >= 3000], 0.0)


def test_apply_residual_eq_stream(tmp_path):
    sr = 48000
    x = _tone(1.5)
    ip = tmp_path / "in.wav"
    audio.write(ip, x, sr, subtype="FLOAT")
    dcsv = tmp_path / "diff_spectrum.csv"
    with open(dcsv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["freq_hz", "delta_db_base_minus_cand"])
        for fr in np.geomspace(20, 20000, 64):
            w.writerow([fr, 3.0 * np.sin(fr / 800.0)])
    op = tmp_path / "out.wav"
    res = eqm.apply_residual_eq(ip, op, dcsv, frames_per_chunk=8)
    y, _ = audio.read(op)
    # oracle: no padding, same smoothing/clamps
    rf, rd = eqm.load_residual_csv(dcsv)
    rds = eqm.smooth_on_logfreq(rf, rd, 41)
    freqs = np.fft.rfftfreq(4096, 1 / sr)
    lin, _ = eqm.build_eq_from_residual(freqs, rf, rds)
    y_ref = np.clip(_oracle_apply(x, lin, 4096, 2048, pad_len=0),
                    -1.0, 8388607 / 8388608.0)
    assert len(y) == len(y_ref)
    d = np.abs(y - y_ref)
    assert np.max(d[2048:-2048]) < 3e-4
    assert np.max(d) < 5e-3


def test_apply_residual_eq_safe_defaults(tmp_path):
    """safe=True alone must yield the actual Safe-B clamps (+1 dB cap,
    forced 0 dB above 3 kHz) — previously the library defaults leaked
    the standard variant's +6 dB / 8 kHz values into the 'safe' path."""
    import csv

    from tomatis_tpu.models.eq import apply_residual_eq

    sr = 48000
    x = _tone(1.0, amp=0.02)
    ip = tmp_path / "in.wav"
    audio.write(ip, x, sr, subtype="PCM_24")
    cp = tmp_path / "diff.csv"
    with open(cp, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["freq_hz", "delta_db_base_minus_cand"])
        for fr in (50, 500, 2000, 5000, 12000, 20000):
            w.writerow([fr, 5.0])          # +5 dB residual everywhere
    res = apply_residual_eq(ip, tmp_path / "out.wav", cp, safe=True,
                            frames_per_chunk=8)
    eq_db = res["eq_db"]
    freqs = np.fft.rfftfreq(4096, 1.0 / sr)
    assert float(eq_db.max()) <= 1.0 + 1e-6          # Safe-B +1 dB cap
    assert np.all(eq_db[freqs >= 3000.0] == 0.0)     # forced 0 above 3 kHz
