"""verify-15db integration: a +-15 dB processed file must PASS the suite;
a passthrough copy must FAIL the spectrum metrics."""
import numpy as np

from tomatis_tpu.io import audio
from tomatis_tpu.models.standard import StandardParams, process
from tomatis_tpu.verify import verify_15db as v15


def _signal(seconds=8.0, sr=48000, seed=9):
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    # quiet floor above the -60 dBFS spectrum threshold, loud well over T
    env = 0.002 + 0.04 * (np.sin(2 * np.pi * 0.45 * t) > 0)
    # broadband so conditional spectra are well-excited everywhere
    from scipy.signal import lfilter
    noise = lfilter([1.0], [1.0, -0.9], rng.standard_normal(n))
    noise = noise / np.max(np.abs(noise))
    x = env * (0.6 * noise + np.sin(2 * np.pi * 330 * t)
               + 0.6 * np.sin(2 * np.pi * 1000 * t)
               + 0.4 * np.sin(2 * np.pi * 5000 * t))
    return np.clip(np.stack([x, 0.95 * x], 1), -1, 1).astype(np.float32)


GATE = dict(gate_ui=40.0, gate_scale=1.0, gate_offset=-75.0,
            hyst_db=1.0, up_delay_ms=0.0)  # T=-35 dBFS


def test_verify_15db_passes_on_processed(tmp_path):
    sr = 48000
    x = _signal()
    ip, op = tmp_path / "in.flac", tmp_path / "out.flac"
    audio.write(ip, x, sr, subtype="PCM_24")
    p = StandardParams(gate_mode="linear", gate_ui=40.0, gate_offset=-75.0,
                       hysteresis_db=1.0, up_delay_ms=0.0)
    process(ip, op, p)
    res = v15.verify(ip, op, out_prefix=str(tmp_path / "v15"), **GATE)
    eng = res["checks"]["engineering"]
    assert eng["pass"], eng
    sp = res["checks"]["spectrum"]
    assert sp["c1_frames"] > 0 and sp["c2_frames"] > 0
    assert sp["c1_rmse"] < 1.5 and sp["c2_rmse"] < 1.5
    assert sp["c1_fc_error"] < 0.5 and sp["c2_fc_error"] < 0.5
    assert sp["platform_ok"], sp
    ti = res["checks"]["tilt_index"]
    assert ti["ti_effect"] > 5.0
    assert res["pass"]
    # artifacts
    rep = open(tmp_path / "v15_report.txt", encoding="utf-8").read()
    # reference report layout (ref src/verify_tomatis_15db.py:514-516,799)
    assert rep.startswith("Tomatis ±15dB 验证报告")
    for section in ("A. 工程检查", "B. Gate 统计", "C. 条件频谱验证",
                    "D. 效果量化"):
        assert section in rep
    assert "总体结果: PASS" in rep
    # the 5-column spectrum CSV artifact (ref :645-653)
    spec = open(tmp_path / "v15_spectrum.csv", encoding="utf-8").read()
    assert spec.startswith("freq_hz,c1_measured_db,c1_theory_db,"
                           "c2_measured_db,c2_theory_db")
    assert (tmp_path / "v15_spectrum.png").exists()
    assert (tmp_path / "v15_tilt_index.png").exists()


def test_verify_15db_fails_on_passthrough(tmp_path):
    sr = 48000
    x = _signal(5.0)
    ip, op = tmp_path / "in.flac", tmp_path / "out.flac"
    audio.write(ip, x, sr, subtype="PCM_24")
    audio.write(op, x, sr, subtype="PCM_24")  # unprocessed copy
    res = v15.verify(ip, op, out_prefix=None, **GATE)
    sp = res["checks"]["spectrum"]
    assert not sp["pass"]          # no tilt applied -> platforms way off
    assert not res["pass"]
    assert res["checks"]["tilt_index"].get("ti_effect", 0.0) < 5.0
