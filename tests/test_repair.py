"""Declick + trim tests."""
import numpy as np

from tomatis_tpu.io import audio
from tomatis_tpu.models.repair import (cut_head, declick, detect_clicks,
                                       inpaint_linear, mad_sigma, merge_runs)


def _clean(n=48000, sr=48000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = 0.3 * np.sin(2 * np.pi * 220 * t)[:, None]
    x = np.repeat(x, 2, 1) + 0.001 * rng.standard_normal((n, 2))
    return x.astype(np.float32)


def test_merge_runs():
    mask = np.array([0, 1, 1, 0, 0, 1, 0, 0, 0, 1, 1], bool)
    np.testing.assert_array_equal(merge_runs(mask),
                                  [[1, 3], [5, 6], [9, 11]])
    np.testing.assert_array_equal(merge_runs(mask, gap=2),
                                  [[1, 6], [9, 11]])
    assert len(merge_runs(np.zeros(5, bool))) == 0


def test_detect_and_inpaint_clicks():
    sr = 48000
    x = _clean(sr)
    clicks = [12345, 30000, 41007]
    for c in clicks:
        x[c] += 0.9  # impulse on both channels
    segs, stats = detect_clicks(x, sr)
    assert stats["hits"] >= len(clicks)
    for c in clicks:
        assert any(s <= c < e for s, e in segs), c
    y = inpaint_linear(x, segs)
    clean = _clean(sr)
    for c in clicks:
        # spike removed; linear inpaint across ~3 ms of a 220 Hz sine may
        # legitimately deviate from the original curve
        assert abs(y[c, 0] - clean[c, 0]) < 0.3
        assert abs(y[c, 0]) < abs(x[c, 0]) - 0.4


def test_declick_file_roundtrip(tmp_path):
    sr = 48000
    x = _clean()
    x[20000] += 0.8
    ip, op = tmp_path / "i.wav", tmp_path / "o.flac"
    rp = tmp_path / "report.csv"
    audio.write(ip, x, sr, subtype="FLOAT")
    stats = declick(ip, op, report_csv=rp)
    assert stats["hits"] >= 1
    y, _ = audio.read(op)
    assert len(y) == len(x)
    assert abs(y[20000, 0]) < 0.4
    lines = open(rp).read().strip().splitlines()
    assert lines[0].startswith("start_sample,end_sample")
    assert len(lines) == 1 + stats["kept_segments"]


def test_declick_clean_passthrough(tmp_path):
    x = _clean(24000)
    ip, op = tmp_path / "i.wav", tmp_path / "o.wav"
    audio.write(ip, x, 48000, subtype="FLOAT")
    stats = declick(ip, op, k=25.0)
    y, _ = audio.read(op)
    assert np.max(np.abs(y - x)) < 2 ** -23 + 1e-6


def test_cut_head(tmp_path):
    sr = 8000
    x = _clean(3 * sr, sr)
    ip, op = tmp_path / "i.wav", tmp_path / "o.wav"
    audio.write(ip, x, sr, subtype="FLOAT")
    stats = cut_head(ip, op, cut_seconds=1.0)
    y, _ = audio.read(op)
    assert len(y) == 2 * sr and stats["cut_samples"] == sr
    np.testing.assert_allclose(y, x[sr:], atol=2e-7)
