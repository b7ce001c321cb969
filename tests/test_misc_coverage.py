"""Odds and ends: 44.1 kHz operation, dBFS track comparison, stage timings."""
import numpy as np

from tomatis_tpu.analysis.levels import compare_dbfs_tracks
from tomatis_tpu.io import audio
from tomatis_tpu.models.standard import StandardParams, process_array, process
from tests.oracle import refdsp


def test_standard_at_44100():
    """BASELINE's headline config is 44.1 kHz stereo; the math is
    rate-generic (freqs from rfftfreq(n_fft, 1/sr))."""
    sr = 44100
    n = 3 * sr
    t = np.arange(n) / sr
    env = 0.003 + 0.1 * (np.sin(2 * np.pi * 0.8 * t) > 0)
    x = np.stack([env * np.sin(2 * np.pi * 441 * t)] * 2, 1).astype(np.float32)
    p = StandardParams(require_48k_stereo=False)
    y, stats = process_array(x, sr, p)
    y_ref, states_ref, _ = refdsp.process_standard_loop(x, sr)
    assert y.shape == x.shape
    assert stats["c2_frames"] == int(np.sum(states_ref == 2))
    assert np.max(np.abs(y - y_ref)) < 2e-4


def test_compare_dbfs_tracks(tmp_path):
    sr = 48000
    n = 5 * sr
    t = np.arange(n) / sr
    x = (0.1 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    x2 = np.stack([x, x], 1)
    ip = tmp_path / "in.wav"
    audio.write(ip, x2, sr, subtype="FLOAT")
    # candidate: delayed + attenuated copy
    cand = np.concatenate([np.zeros((sr // 4, 2), np.float32), 0.5 * x2])
    cp = tmp_path / "cand.wav"
    audio.write(cp, cand, sr, subtype="FLOAT")
    res = compare_dbfs_tracks(ip, {"dev": cp},
                              out_prefix=str(tmp_path / "trk"))
    r = res["dev"]
    assert abs(r["lag"] - sr // 4) < sr * 0.01
    # RMS-normalized: tracks should nearly coincide
    d = np.abs(r["in_dbfs"] - r["out_dbfs"])
    assert np.median(d) < 0.5
    assert (tmp_path / "trk_dev.csv").exists()


def test_compare_dbfs_cli_chains_into_gate_threshold(tmp_path, monkeypatch):
    """compare-dbfs CLI -> CSV -> analyze-gate-threshold: the fallback
    output-column matcher must accept <candidate>_dbfs names."""
    sr = 48000
    t = np.arange(10 * sr) / sr
    env = np.where((t % 4) < 2, 0.006, 0.2)
    x = (env * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    ip = tmp_path / "src.wav"
    audio.write(ip, np.stack([x, x], 1), sr, subtype="PCM_24")
    y = np.where(env > 0.1, 2.0, 1.0).astype(np.float32) * x  # gate-ish jump
    cp = tmp_path / "dev.wav"
    audio.write(cp, np.stack([y, y], 1), sr, subtype="PCM_24")

    monkeypatch.chdir(tmp_path)
    from tomatis_tpu.cli.analyzers import compare_dbfs_main
    assert compare_dbfs_main(["-i", str(ip), "-c", f"dev={cp}",
                              "--out_prefix", "trk"]) == 0
    from tomatis_tpu.analysis.levels import gate_threshold_from_csv
    res = gate_threshold_from_csv(tmp_path / "trk_dev.csv", 3.0)
    assert res is not None and res["n_switches"] >= 2


def test_edge_lengths_and_empty_input():
    """Inputs shorter than a frame, straddling chunk boundaries, and empty
    must all round-trip with the input shape."""
    p = StandardParams(require_48k_stereo=False, n_fft=1024, hop=512)
    rng = np.random.default_rng(0)
    for n in (0, 1, 511, 512, 1023, 1024, 1025):
        x = (0.05 * rng.standard_normal((n, 2))).astype(np.float32)
        y, stats = process_array(x, 48000, p, frames_per_chunk=8)
        assert y.shape == x.shape, n
        if n == 0:
            assert stats["n_frames"] == 0


def test_stage_timings_reported(tmp_path):
    sr = 48000
    x = (0.05 * np.random.default_rng(0).standard_normal((2 * sr, 2))
         ).astype(np.float32)
    ip, op = tmp_path / "i.wav", tmp_path / "o.wav"
    audio.write(ip, x, sr, subtype="FLOAT")
    stats = process(ip, op, StandardParams(require_48k_stereo=False))
    t = stats["timings"]
    assert set(t) == {"input_host_s", "dispatch_compute_s", "consume_s"}
    assert all(v >= 0 for v in t.values())
    assert stats["realtime_factor"] > 0


def test_spectrum_metrics_v2_uses_actual_slope():
    """The platform/slope corner frequencies must follow the slope the
    theory curves were built with (the reference hardcodes 12 dB/oct
    there; identical at the default)."""
    import numpy as np

    from tomatis_tpu.verify.verify_15db_v2 import compute_spectrum_metrics_v2

    freqs = np.linspace(50, 10000, 2000)
    th = np.zeros_like(freqs)
    # slope 6: corners at fc*2^(+-2.5) ~ 177 / 5657 Hz
    m = compute_spectrum_metrics_v2(freqs, th, th, th, th,
                                    fc=1000.0, gain_limit=15.0, slope=6.0)
    # with slope 6 the hi platform band (>= 1.2*5657) is empty below 10 kHz
    # only above 6788 Hz; ensure the slope segment reaches past the 12-slope
    # corner at 2378 Hz (it would not if 12 were still hardcoded)
    assert "c1_slope_rmse" in m
    m12 = compute_spectrum_metrics_v2(freqs, th, th, th, th,
                                      fc=1000.0, gain_limit=15.0, slope=12.0)
    # default slope keeps the reference's corner bands
    assert "c1_hi_platform_rmse" in m12


def test_compare_gate_states_common_prefix_switches():
    """Switch counts are computed over the same common prefix as the
    per-frame comparison (a longer CSV must not report spurious diffs)."""
    import numpy as np

    from tomatis_tpu.verify.validate_layer1 import compare_gate_states

    csv_states = ["C1"] * 10 + ["C2", "C1"] * 20     # extra tail w/ switches
    sim_states = ["C1"] * 10
    lv = np.zeros(len(csv_states))
    r = compare_gate_states(csv_states, sim_states, lv[:10], lv)
    assert r["total_frames"] == 10
    assert r["csv_switches"] == 0 and r["sim_switches"] == 0
    assert r["switch_diff"] == 0


def test_cut_default_output_name(tmp_path):
    """Auto-named trims reflect the actual cut length and survive
    extension-less inputs."""
    import numpy as np

    from tomatis_tpu.cli.repair import cut_main
    from tomatis_tpu.io import audio

    sr = 48000
    x = np.zeros((sr * 2, 2), np.float32)
    ip = tmp_path / "rec.wav"
    audio.write(ip, x, sr, subtype="PCM_24")
    rc = cut_main([str(ip), str(tmp_path / "o.wav"), "0.5"])
    assert rc == 0
    # auto-name carries the cut length and the input extension
    ap = tmp_path / "rec2.wav"
    audio.write(ap, x, sr, subtype="PCM_24")
    assert cut_main([str(ap)]) in (0, 1)      # default 16 s, auto-named
    assert (tmp_path / "rec2_cut16s.wav").exists()
    # extension-less input must not crash on the auto-name split
    bare = tmp_path / "noext"
    import shutil
    shutil.copy(ip, bare)
    # format can't be inferred without an extension -> clean [ERR],
    # never an unpack ValueError traceback
    assert cut_main([str(bare)]) == 1


def test_frame_levels_1d_blocked_matches_unblocked():
    import numpy as np

    from tomatis_tpu.analysis.levels import frame_levels_1d

    rng = np.random.default_rng(3)
    x = rng.standard_normal(48000).astype(np.float32) * 0.1
    a = frame_levels_1d(x, 4096, 2048)
    b = frame_levels_1d(x, 4096, 2048, blk=7)    # uneven block boundary
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_process_flac_encode_fallback_to_wav(tmp_path, monkeypatch, capsys):
    """With the native codec unavailable, a .flac output request falls
    back to a .wav next to it with a conversion hint, like the reference
    (ref src/process_tomatis.py:241-251,471-474) — instead of failing."""
    import numpy as np

    from tomatis_tpu.io import audio
    from tomatis_tpu.models.standard import StandardParams, process
    from tomatis_tpu.native import build

    sr = 48000
    x = (0.05 * np.sin(2 * np.pi * 500 * np.arange(sr) / sr))
    x = np.stack([x, x], 1).astype(np.float32)
    ip = tmp_path / "in.wav"
    audio.write(ip, x, sr, subtype="PCM_24")

    monkeypatch.setenv("TOMATIS_NO_NATIVE", "1")
    monkeypatch.setattr(build, "_CACHE", {})
    out = tmp_path / "out.flac"
    stats = process(ip, out, StandardParams(), frames_per_chunk=16)
    assert not out.exists()
    assert stats["out_path"].endswith("out.wav")
    y, osr = audio.read(stats["out_path"])
    assert osr == sr and len(y) == len(x)
    assert "writing WAV instead" in capsys.readouterr().out
