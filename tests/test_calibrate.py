"""Calibration round trip: synthesize an 'original', create a fake device
recording by processing it with KNOWN gate params (+ gain + delay), then
check the calibrators recover threshold/hysteresis/delay/gain."""
import numpy as np
import pytest

from tomatis_tpu.io import audio
from tomatis_tpu.models.standard import StandardParams, process_array
from tomatis_tpu.analysis import align, calibrate, features, gridgate
from tests.oracle import refdsp


SR = 48000
TRUE_T = -30.0     # dBFS threshold used to make the fake device recording
TRUE_HYST = 2.0
TRUE_GAIN = -6.0   # device recording is 6 dB quieter than the original


def _orig(seconds=60.0, seed=7):
    """Music-like signal with percussive note onsets (sharp envelope
    structure makes the envelope cross-correlation unambiguous, as real
    music is) whose level swings across the gate threshold."""
    rng = np.random.default_rng(seed)
    n = int(seconds * SR)
    t = np.arange(n) / SR
    amp = np.full(n, 0.004, np.float32)
    pos = 0
    while pos < n:
        dur = int(SR * rng.uniform(0.15, 0.6))
        peak = 0.02 * 10 ** (0.5 * rng.standard_normal())
        seg = min(dur, n - pos)
        amp[pos:pos + seg] += peak * np.exp(-np.arange(seg) / (0.25 * SR))
        pos += dur
    x = amp * (np.sin(2 * np.pi * 400 * t) + 0.6 * np.sin(2 * np.pi * 2500 * t)
               + 0.1 * rng.standard_normal(n))
    return np.clip(np.stack([x, 0.95 * x], 1), -1, 1).astype(np.float32)


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cal")
    x = _orig()
    # fake device output: strong tilt so the tilt clustering is easy
    p = StandardParams(gate_ui=50.0, gate_mode="linear",
                       gate_offset=TRUE_T - 50.0, hysteresis_db=TRUE_HYST,
                       up_delay_ms=0.0, c1_low=9.0, c1_high=-9.0,
                       c2_low=-9.0, c2_high=9.0, require_48k_stereo=False,
                       output_gain_db=TRUE_GAIN)
    y, _ = process_array(x, SR, p)
    # simulate a recording offset: device file starts 0.5 s later
    off = SR // 2
    orig_p = tmp / "orig.flac"
    base_p = tmp / "base.flac"
    audio.write(orig_p, x, SR, subtype="PCM_24")
    audio.write(base_p, y[off:], SR, subtype="PCM_24")
    return orig_p, base_p


def test_align_finds_offset(pair):
    orig_p, base_p = pair
    delay = align.find_delay_by_corr(orig_p, base_p, sr=SR)
    assert abs(delay - SR // 2) < SR * 0.03  # within 30 ms


def test_grid_gate_matches_loop_oracle():
    rng = np.random.default_rng(0)
    levels = (-45 + 25 * rng.random(400)).astype(np.float32)
    starts = (np.arange(400) * 2048).astype(np.int64)
    combos = [dict(T=float(T), hyst=float(h), up_ms=float(u))
              for T in (-40, -33.5, -27) for h in (0, 2.5) for u in (0, 130)]
    tgt = np.ones(400, np.int32)
    for c in combos:
        states_ref = refdsp.gate_updelay_loop(
            levels, c["T"] + c["hyst"] / 2, c["T"] - c["hyst"] / 2,
            int(round(SR * c["up_ms"] / 1000)), 2048)
        scores, mism, sw = gridgate.grid_gate_scores(
            np.asarray(levels), starts.astype(np.int32),
            np.array([c["T"] + c["hyst"] / 2], np.float32),
            np.array([c["T"] - c["hyst"] / 2], np.float32),
            np.array([int(round(SR * c["up_ms"] / 1000))], np.int32),
            np.float32(0.0), tgt)
        got_mismatch = float(np.asarray(mism)[0])
        want = float(np.mean(states_ref != tgt))
        assert abs(got_mismatch - want) < 1e-6, c


def test_calibrate_v2_recovers_params(pair, tmp_path):
    orig_p, base_p = pair
    res = calibrate.calibrate_v2(
        orig_p, base_p, gate_ui=50.0,
        out_json=str(tmp_path / "calibration_v2.json"))
    # the joint search compensates gain inside T_adj, so T_raw — the number
    # that actually drives process_tomatis — is the tight recovery target;
    # gain itself conflates the +-9 dB tilt with level (as in the reference,
    # it is a diagnostic)
    assert abs(res["T_raw_dbfs"] - TRUE_T) <= 1.5
    assert abs(res["hyst_db"] - TRUE_HYST) <= 1.0
    assert res["mismatch"] < 0.05
    assert res["up_delay_ms"] <= 50.0
    import json
    saved = json.load(open(tmp_path / "calibration_v2.json"))
    assert abs(saved["gate_offset"] - (res["T_raw_dbfs"] - 50.0)) < 1e-6


def test_calibrate_v1_recovers_threshold(pair, tmp_path):
    orig_p, base_p = pair
    res = calibrate.calibrate_v1(
        orig_p, base_p, gate_ui=50.0,
        out_json=str(tmp_path / "calibration.json"))
    # v1 has no gain search: it fits T on the ORIGINAL levels, so the
    # recovered threshold matches TRUE_T (gate ran on the original)
    assert abs(res["best"]["T"] - TRUE_T) <= 1.0
    assert res["best"]["mismatch"] < 0.05
