"""Worked calibration case study (docs/case_study): regenerate the loop
and check the recovered parameters against the baked-in ground truth,
plus the committed artifact's own numbers. Mirrors the reference's
acceptance-evidence documents (ref docs/Workflow_v2.md:49-63,
docs/最终校准报告.md:8-40) with a synthetic device so truth is known."""
import json
import os

import pytest

from tomatis_tpu.verify.case_study import TRUE, run_case_study

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_case_study_regenerates(tmp_path):
    r = run_case_study(tmp_path, seconds=40.0)
    err = r["errors"]
    assert err["threshold_db"] < 0.6
    assert err["hyst_db"] < 0.01     # exact at >= 2 dB (see case_study)
    assert err["gain_db"] < 1.0
    assert err["delay_s"] < 0.03
    assert r["validate_pass"]
    # compare: matched-vs-device anchor gain recovers the level drop
    assert abs(r["compare"]["anchor_gain_db"] - TRUE["gain_db"]) < 0.5
    # artifacts on disk
    for f in ("calibration_v2.json", "report.json", "REPORT.md",
              "matched.flac", "matched.flac.params.json"):
        assert (tmp_path / f).exists(), f


def test_committed_artifact_consistent():
    """The checked-in docs/case_study/report.json must carry the same
    ground truth and pass the same tolerances the regeneration test
    enforces (guards against a stale committed artifact)."""
    path = os.path.join(REPO, "docs", "case_study", "report.json")
    with open(path, encoding="utf-8") as f:
        r = json.load(f)
    assert r["true"] == {k: TRUE[k] for k in r["true"]}
    err = r["errors"]
    assert err["threshold_db"] < 0.6 and err["gain_db"] < 1.0
    assert err["hyst_db"] < 0.01 and err["delay_s"] < 0.03
    assert r["validate_pass"]
    cal = json.load(open(os.path.join(REPO, "docs", "case_study",
                                      "calibration_v2.json")))
    assert cal["hyst_db"] == r["recovered"]["hyst_db"]
    assert abs(cal["T_raw_dbfs"] - r["recovered"]["threshold_dbfs"]) < 1e-6
