"""Comparison suite tests (reuses the colored-pair fixture style)."""
import numpy as np
import pytest

from tomatis_tpu.analysis import compare_suite as cs
from tomatis_tpu.io import audio
from tests.test_analyze_compare import _colorize, _music, COLOR

SR = 48000


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cmp")
    x = _music(30.0)
    base = _colorize(x, COLOR)
    bp = tmp / "base.flac"
    c1 = tmp / "candA.flac"
    c2 = tmp / "candB.flac"
    audio.write(bp, base, SR, subtype="PCM_24")
    audio.write(c1, x, SR, subtype="PCM_24")
    audio.write(c2, (0.8 * base).astype(np.float32), SR, subtype="PCM_24")
    return bp, c1, c2


def test_compare_to_baseline(pair, tmp_path):
    bp, c1, c2 = pair
    results = cs.compare_to_baseline(bp, [c1, c2], str(tmp_path / "out"),
                                     max_minutes=0.6)
    byname = {r["name"]: r for r in results}
    # candB is the baseline itself rescaled: near-identical shape
    assert byname["candB"]["music_err"] < 0.3
    assert abs(byname["candB"]["gain_db"] - 20 * np.log10(1 / 0.8)) < 0.3
    # candA differs by the coloration
    assert byname["candA"]["music_err"] > byname["candB"]["music_err"]
    out = tmp_path / "out"
    assert (out / "summary.txt").exists()
    assert (out / "diff_candA.csv").exists()
    assert (out / "delta_overlay.png").exists()
    assert (out / "env_rms_dbfs.png").exists()
    head = open(out / "diff_candA.csv").readline().strip()
    assert head == "freq_hz,delta_raw_db,delta_anchored_db,delta_smooth_db"


def test_compare_three(pair, tmp_path, monkeypatch):
    bp, c1, c2 = pair
    monkeypatch.chdir(tmp_path)
    results = cs.compare_three(bp, [c1], plot_sec=10.0, max_sec_spec=20.0,
                               out_prefix="cmp")
    r = results[0]
    # base has low boost/high cut vs candA -> positive low band delta
    assert r["band_200_1k_db"] > 0.3
    assert r["band_3k_8k_db"] < -1.0
    import os
    assert any(f.startswith("cmp_diff_") for f in os.listdir("."))


def test_compare_diff_spectrum_and_plot(pair, tmp_path):
    bp, c1, _ = pair
    res = cs.compare_diff_spectrum(
        bp, c1, max_minutes=0.5,
        out_csv=str(tmp_path / "ds.csv"), out_png=str(tmp_path / "ds.png"))
    assert len(res["freqs"]) == 512
    assert np.all(np.abs(res["delta_raw"]) <= 12.0 + 1e-6)
    # residual applier consumes this CSV schema
    head = open(tmp_path / "ds.csv").readline().strip()
    assert head == "freq_hz,delta_db_raw,delta_db_smooth"
    out = cs.plot_diff_spectrum(tmp_path / "ds.csv")
    assert "200-1000" in out["bands"]
    assert (tmp_path / "ds.png").exists()
