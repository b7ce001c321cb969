"""Level/segment analyzer tests."""
import numpy as np

from tomatis_tpu.analysis import levels as lv
from tomatis_tpu.analysis import segments as seg
from tomatis_tpu.io import audio

SR = 48000


def _stepped(tmp_path, name="a.wav", quiet=0.003, loud=0.2, seconds=6.0):
    n = int(seconds * SR)
    t = np.arange(n) / SR
    env = quiet + loud * ((t > 2.0) & (t < 4.0))
    x = env * np.sin(2 * np.pi * 440 * t)
    p = tmp_path / name
    audio.write(p, np.stack([x, 0.9 * x], 1).astype(np.float32), SR,
                subtype="FLOAT")
    return p, np.stack([x, 0.9 * x], 1).astype(np.float32)


def test_dbfs_distribution(tmp_path):
    p, _ = _stepped(tmp_path)
    res = lv.dbfs_distribution(p)
    pc = res["percentiles"]
    assert pc[1] < -50 and pc[99] > -25
    assert res["dynamic_range"] > 20
    s = res["suggestions"]["p50"]
    assert abs(s["gate_ui"] - (s["threshold_dbfs"] + 100)) < 1e-6


def test_gate_threshold_from_tracks():
    t = np.arange(100) * 0.1
    in_dbfs = np.where((t > 3) & (t < 7), -20.0, -50.0)
    out_dbfs = np.where((t > 3) & (t < 7), -10.0, -55.0)  # big jumps
    res = lv.gate_threshold_from_tracks(t, in_dbfs, out_dbfs)
    assert res["n_switches"] == 2
    # switch frames carry the post-switch input level
    assert -55 < res["mean"] < -15


def test_stereo_state_csv(tmp_path):
    p, _ = _stepped(tmp_path)
    out = tmp_path / "stereo.csv"
    res = lv.analyze_stereo_state(p, out, target_c2=0.4)
    assert 0.1 < res["left"]["c2_ratio"] < 0.7
    lines = open(out, encoding="utf-8").read().splitlines()
    assert lines[0].split(",")[:2] == ["Frame", "音频秒数(秒)"]
    assert len(lines) == res["n_frames"] + 1


def test_merge_state_volume(tmp_path):
    p, x = _stepped(tmp_path)
    # make a state CSV via the standard processor
    from tomatis_tpu.models.standard import StandardParams, process
    op = tmp_path / "out.flac"
    cp = tmp_path / "st.csv"
    process(p, op, StandardParams(require_48k_stereo=False),
            state_csv_path=cp)
    mp = tmp_path / "merged.csv"
    res = lv.merge_state_volume(cp, op, mp)
    assert res["channels"] == 2
    lines = open(mp, encoding="utf-8").read().splitlines()
    assert "Left_dBFS" in lines[0]
    assert len(lines) == res["n_rows"] + 1


def test_amplitude_and_transition_profiles(tmp_path):
    p, _ = _stepped(tmp_path)
    prof = lv.amplitude_profile(p, out_png=str(tmp_path / "prof.png"))
    assert (tmp_path / "prof.png").exists()
    # loud region shows up
    sel = (prof["times"] >= 2.5) & (prof["times"] <= 3.5)
    assert np.mean(prof["levels"][sel]) > -25
    tr = lv.transition_profile(p, 1.5, 2.5)
    assert len(tr["levels"]) == 10
    assert tr["levels"][-1] > tr["levels"][0] + 20  # crosses the onset


def test_find_main_segment(tmp_path):
    p, _ = _stepped(tmp_path, quiet=0.0005, loud=0.3)
    res = seg.find_main_segment(p, min_seg_sec=1.0)
    assert res["found"]
    assert abs(res["start"] - 2.0) < 0.3
    assert abs(res["end"] - 4.0) < 0.3


def test_find_start_and_end(tmp_path):
    n = int(25.0 * SR)
    t = np.arange(n) / SR
    env = 0.0005 + 0.25 * ((t > 16.0) & (t < 21.0))
    x = env * np.sin(2 * np.pi * 500 * t)
    p = tmp_path / "m.wav"
    audio.write(p, np.stack([x, x], 1).astype(np.float32), SR,
                subtype="FLOAT")
    st = seg.find_start_smart(p, search_duration=25.0)
    assert any(abs(c - 16.0) < 0.3 for c in st["candidates"]), st["candidates"]
    en = seg.find_end_smart(p, search_duration=8.0)
    assert en["found"]
    assert abs(en["end_time"] - 21.0) < 0.6
    assert en["recommended_cut"] is not None
