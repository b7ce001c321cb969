"""Reverse-engineering round trip: process with a known threshold, then
recover it from the input/output pair."""
import numpy as np

from tomatis_tpu.analysis.reverse import analyze_device_params
from tomatis_tpu.io import audio
from tomatis_tpu.models.standard import StandardParams, process_array

SR = 48000
TRUE_T = -32.0


def test_reverse_engineer_recovers_threshold(tmp_path):
    rng = np.random.default_rng(21)
    n = int(20.0 * SR)
    t = np.arange(n) / SR
    # level sweeps across the threshold; broadband content
    from scipy.signal import lfilter
    noise = lfilter([1.0], [1.0, -0.9], rng.standard_normal(n))
    noise = noise / np.max(np.abs(noise))
    env = 0.05 * 10 ** (1.2 * np.sin(2 * np.pi * 0.21 * t) / 2)
    x = np.clip(np.stack([env * noise, 0.95 * env * noise], 1), -1,
                1).astype(np.float32)

    p = StandardParams(gate_mode="linear", gate_ui=50.0,
                       gate_offset=TRUE_T - 50.0, hysteresis_db=1.0,
                       up_delay_ms=0.0, require_48k_stereo=False)
    y, _ = process_array(x, SR, p)
    ip, op = tmp_path / "in.flac", tmp_path / "out.flac"
    audio.write(ip, x, SR, subtype="PCM_24")
    audio.write(op, y, SR, subtype="PCM_24")

    res = analyze_device_params(ip, op, out_csv=str(tmp_path / "rev.csv"))
    assert res["gate_threshold"] is not None
    est = res["gate_threshold"]["estimate"]
    assert abs(est - TRUE_T) < 4.0  # midpoint estimate is coarse by design
    # level-bin table transitions from C1 (low) to C2 (high)
    states = [row["state"] for row in res["level_table"] if row["n"] > 5]
    assert states[0] == "C1" and states[-1] == "C2"
    lines = open(tmp_path / "rev.csv").read().splitlines()
    assert lines[0] == "frame,time_sec,inp_level_dbfs,tilt_db"
    assert len(lines) == res["n_frames"] + 1
