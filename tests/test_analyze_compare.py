"""End-to-end Layer-2 pipeline: color a signal with a known EQ, let
analyze_eq recover the curve, apply it, and verify the spectra converge.
Also compare_audio band deltas + diff_spectrum -> residual applier chain."""
import numpy as np
import pytest

from tomatis_tpu.analysis.analyze_eq import analyze_eq
from tomatis_tpu.analysis.compare import compare_audio
from tomatis_tpu.io import audio
from tomatis_tpu.models import eq as eqm

SR = 48000


def _music(seconds=40.0, seed=11):
    """Broadband music-like signal: filtered noise bursts."""
    rng = np.random.default_rng(seed)
    n = int(seconds * SR)
    x = rng.standard_normal(n).astype(np.float32)
    # pink-ish tilt via cumulative smoothing
    from scipy.signal import lfilter
    x = lfilter([1.0], [1.0, -0.95], x).astype(np.float32)
    t = np.arange(n) / SR
    env = 0.02 + 0.06 * (np.sin(2 * np.pi * 0.9 * t + 1) > 0)
    x = (x / np.max(np.abs(x))) * env
    return np.stack([x, 0.97 * x], 1).astype(np.float32)


def _colorize(x, gains_db_at):
    """Apply a known smooth EQ coloration via FFT filtering."""
    n = len(x)
    freqs = np.fft.rfftfreq(n, 1 / SR)
    fs, dbs = zip(*gains_db_at)
    curve = np.interp(np.log10(np.maximum(freqs, 1)),
                      np.log10(fs), dbs)
    g = 10 ** (curve / 20.0)
    y = np.empty_like(x)
    for c in range(x.shape[1]):
        y[:, c] = np.fft.irfft(np.fft.rfft(x[:, c]) * g, n)
    return y.astype(np.float32)


COLOR = [(30, -3.0), (200, 4.0), (1000, 0.0), (4000, -5.0), (16000, -8.0)]


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("l2")
    x = _music()
    base = _colorize(x, COLOR)          # "device" sound = colored
    bp = tmp / "base.flac"
    tp = tmp / "target.flac"
    audio.write(bp, base, SR, subtype="PCM_24")
    audio.write(tp, x, SR, subtype="PCM_24")
    return bp, tp, x, base


def test_analyze_eq_recovers_coloration(pair, tmp_path):
    bp, tp, x, base = pair
    res = analyze_eq(bp, tp, out_csv=str(tmp_path / "eq.csv"), out_png=None)
    freqs = res["freqs"]
    got = res["delta_smooth"]
    # expected curve (anchored like the analyzer: mid-band median removed)
    fs, dbs = zip(*COLOR)
    want = np.interp(np.log10(np.maximum(freqs, 1)), np.log10(fs), dbs)
    m = (freqs >= 300) & (freqs <= 3000)
    want = want - np.median(want[m])
    sel = (freqs >= 100) & (freqs <= 12000)
    err = np.abs(got[sel] - want[sel])
    assert np.percentile(err, 90) < 1.5  # curve recovered within 1.5 dB

    # closing the loop: applying the curve to the target approximates base
    op = tmp_path / "matched.flac"
    eqm.apply_eq(tp, op, tmp_path / "eq.csv", pad=True)
    res2 = compare_audio(bp, op, out_csv=None)
    for band, st in res2["bands"].items():
        if band != "8000-16000":  # tiny HF energy -> noisy estimate
            assert abs(st["mean"]) < 1.0, (band, st)


def test_compare_audio_reports_tilt(pair, tmp_path):
    bp, tp, x, base = pair
    res = compare_audio(bp, tp, sr=SR,
                        out_csv=str(tmp_path / "diff_spectrum.csv"))
    assert abs(res["delay_samples"]) < SR * 0.02
    # base has boosted lows and cut highs vs target (the 300-3000 anchor
    # absorbs part of the low boost, so thresholds are conservative)
    assert res["bands"]["200-1000"]["mean"] > 0.5
    assert res["bands"]["3000-8000"]["mean"] < -1.0
    head = open(tmp_path / "diff_spectrum.csv").readline().strip()
    assert head == "freq_hz,delta_db_base_minus_cand"

    # diff_spectrum feeds the residual applier chain
    out = tmp_path / "res.flac"
    r = eqm.apply_residual_eq(tp, out, tmp_path / "diff_spectrum.csv")
    assert r["n_frames"] > 0
    y, _ = audio.read(out)
    assert len(y) > 0
