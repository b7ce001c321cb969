"""Integration: process -> validate must PASS (the reference's acceptance
loop), plus unit tests of the validator pieces."""
import numpy as np

from tomatis_tpu.io import audio
from tomatis_tpu.models.standard import StandardParams, process
from tomatis_tpu.verify import validate_layer1 as vl


def _signal(seconds=6.0, sr=48000, seed=5):
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    env = 0.002 + 0.12 * (np.sin(2 * np.pi * 0.5 * t) > 0)
    x = env * (np.sin(2 * np.pi * 300 * t) + 0.7 * np.sin(2 * np.pi * 1000 * t)
               + 0.5 * np.sin(2 * np.pi * 4000 * t)
               + 0.1 * rng.standard_normal(n))
    return np.clip(np.stack([x, 0.9 * x], 1), -1, 1).astype(np.float32)


def test_find_stable_frames():
    states = ["C1"] * 6 + ["C2"] * 6 + ["C1"] * 3
    c1, c2 = vl.find_stable_frames(states, margin=2)
    assert list(c1) == [2, 3]            # inside the first C1 run
    assert list(c2) == [8, 9]            # inside the C2 run
    # the trailing C1 run is too short / touches the boundary


def test_gate_stats():
    s = ["C1"] * 10 + ["C2"] * 2 + ["C1"] * 8
    st = vl.analyze_gate_stats(s)
    assert st["switch_count"] == 2
    assert st["run_count"] == 3
    assert st["short_runs"] == 1
    assert abs(st["c2_ratio"] - 0.1) < 1e-9


def test_process_then_validate_passes(tmp_path):
    sr = 48000
    x = _signal()
    ip = tmp_path / "in.flac"
    op = tmp_path / "out.flac"
    cp = tmp_path / "state.csv"
    audio.write(ip, x, sr, subtype="PCM_24")

    # validator-default filter (+-5 dB) and gate (linear, offset -61.08);
    # ui 40 -> T=-21.08 dBFS sits between the signal's loud (-19 dBFS) and
    # quiet (-54 dBFS) passages while the +5 dB boost keeps peak < 0.98
    p = StandardParams(gate_ui=40.0, gate_mode="linear", gate_offset=-61.08,
                       hysteresis_db=1.0, up_delay_ms=0.0,
                       c1_low=5.0, c1_high=-5.0, c2_low=-5.0, c2_high=5.0)
    process(ip, op, p, state_csv_path=cp)

    res = vl.validate(ip, op, cp, gate_ui=40.0,
                      out_csv=str(tmp_path / "spec.csv"), out_png=None)
    eng = res["checks"]["engineering"]
    assert eng["frames_match"] and eng["sr_match"] and eng["ch_match"]
    assert eng["peak_safe"]
    g = res["checks"]["gate"]
    assert g["mismatch_rate"] < 0.01
    assert g["level_max_diff"] < 0.1
    sp = res["checks"]["spectrum"]
    assert sp["c1_frames"] > 0 and sp["c2_frames"] > 0
    assert max(sp["c1_rmse"] + sp["c2_rmse"]) < 1.5
    assert res["pass"]
    # spectrum CSV written with the reference schema
    head = open(tmp_path / "spec.csv").readline().strip()
    assert head == "freq_hz,c1_measured_db,c1_theory_db,c2_measured_db,c2_theory_db"


def test_validate_fails_on_wrong_csv(tmp_path):
    sr = 48000
    x = _signal(4.0)
    ip = tmp_path / "in.flac"
    op = tmp_path / "out.flac"
    cp = tmp_path / "state.csv"
    audio.write(ip, x, sr, subtype="PCM_24")
    p = StandardParams(gate_ui=40.0, gate_mode="linear", gate_offset=-61.08,
                       hysteresis_db=1.0, up_delay_ms=0.0,
                       c1_low=5.0, c1_high=-5.0, c2_low=-5.0, c2_high=5.0)
    process(ip, op, p, state_csv_path=cp)
    # corrupt the CSV states
    lines = open(cp).read().splitlines()
    flipped = [lines[0]]
    for ln in lines[1:]:
        parts = ln.split(",")
        parts[3] = "C2" if parts[3] == "C1" else "C1"
        flipped.append(",".join(parts))
    open(cp, "w").write("\n".join(flipped))
    res = vl.validate(ip, op, cp, gate_ui=40.0, out_csv=None, out_png=None)
    assert not res["checks"]["gate"]["pass"]
    assert not res["pass"]
