"""`tomatis match`: the automated Workflow_v2 chain (one command replacing
the reference's six hand-chained scripts) must converge on synthetic data
and emit every stage artifact."""
import json
import os

import numpy as np
import pytest

from tests.test_workflow_v2 import (DEVICE_COLOR, DEVICE_GAIN, SR, TRUE_HYST,
                                    TRUE_T, _colorize, _music)
from tomatis_tpu.io import audio
from tomatis_tpu.models.standard import StandardParams, process_array


@pytest.mark.slow
def test_match_device_end_to_end(tmp_path):
    orig = _music()
    p_dev = StandardParams(gate_ui=50.0, gate_mode="linear",
                           gate_offset=TRUE_T - 50.0,
                           hysteresis_db=TRUE_HYST, up_delay_ms=0.0,
                           c1_low=3.0, c1_high=-3.0, c2_low=-3.0,
                           c2_high=3.0, require_48k_stereo=False,
                           output_gain_db=DEVICE_GAIN)
    dev, _ = process_array(orig, SR, p_dev)
    dev = _colorize(dev, DEVICE_COLOR)
    off = int(0.3 * SR)
    orig_p = tmp_path / "orig.flac"
    base_p = tmp_path / "device.flac"
    audio.write(orig_p, orig, SR, subtype="PCM_24")
    audio.write(base_p, np.clip(dev[off:], -1, 1), SR, subtype="PCM_24")

    from tomatis_tpu.cli.match import main as match_main
    outdir = tmp_path / "match"
    rc = match_main(["--orig", str(orig_p), "--device", str(base_p),
                     "-o", str(outdir), "--c1_low", "3", "--c1_high", "-3",
                     "--c2_low", "-3", "--c2_high", "3",
                     "--max_minutes", "1.0", "--allow_any_rate"])
    assert rc == 0

    for name in ("calibration_v2.json", "state.csv", "layer1.flac",
                 "layer2_eq_curve.csv", "layer2.flac", "diff_spectrum.csv",
                 "matched.flac", "final_diff_spectrum.csv",
                 "match_report.json"):
        assert os.path.exists(outdir / name), name

    rep = json.load(open(outdir / "match_report.json"))
    st = rep["stages"]
    assert abs(st["calibrate"]["T_raw_dbfs"] - TRUE_T) < 2.0
    # each stage tightens the spectral match; the chain lands < 0.4 dB
    assert st["layer2"]["music_err_db"] < st["layer1"]["music_err_db"]
    assert st["final"]["music_err_db"] < 0.4

    # the interior of the final render must not clip (edge samples of the
    # uncropped OLA stream are allowed to, matching the reference appliers)
    y, _ = audio.read(outdir / "matched.flac")
    assert np.max(np.abs(y[4096:-4096])) <= 0.9901


@pytest.mark.slow
def test_match_device_wav_fallback(tmp_path, monkeypatch):
    """With FLAC encoding unavailable every stage falls back to a .wav
    sink; match_device must chain the ACTUAL written paths (regression:
    stage paths were hardcoded .flac, so the workflow crashed reading a
    file that was never written)."""
    from tomatis_tpu.native import build
    monkeypatch.setenv("TOMATIS_NO_NATIVE", "1")
    monkeypatch.setattr(build, "_CACHE", {})

    orig = _music()
    p_dev = StandardParams(gate_ui=50.0, gate_mode="linear",
                           gate_offset=TRUE_T - 50.0,
                           hysteresis_db=TRUE_HYST, up_delay_ms=0.0,
                           c1_low=3.0, c1_high=-3.0, c2_low=-3.0,
                           c2_high=3.0, require_48k_stereo=False,
                           output_gain_db=DEVICE_GAIN)
    dev, _ = process_array(orig, SR, p_dev)
    dev = _colorize(dev, DEVICE_COLOR)
    off = int(0.3 * SR)
    orig_p = tmp_path / "orig.wav"
    base_p = tmp_path / "device.wav"
    audio.write(orig_p, orig, SR, subtype="PCM_24")
    audio.write(base_p, np.clip(dev[off:], -1, 1), SR, subtype="PCM_24")

    from tomatis_tpu.cli.match import main as match_main
    outdir = tmp_path / "match"
    rc = match_main(["--orig", str(orig_p), "--device", str(base_p),
                     "-o", str(outdir), "--c1_low", "3", "--c1_high", "-3",
                     "--c2_low", "-3", "--c2_high", "3",
                     "--max_minutes", "1.0", "--allow_any_rate"])
    assert rc == 0
    rep = json.load(open(outdir / "match_report.json"))
    assert rep["matched_path"].endswith(".wav")
    assert os.path.exists(rep["matched_path"])
    assert rep["stages"]["final"]["music_err_db"] < 0.4
