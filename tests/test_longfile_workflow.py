"""BASELINE config 4 as one chain: smart segment trim + declick +
process + merge_state_volume (at test scale — the components are
length-invariant streaming/chunked code)."""
import numpy as np
import pytest

from tomatis_tpu.analysis.levels import merge_state_volume
from tomatis_tpu.analysis.segments import find_end_smart, find_start_smart
from tomatis_tpu.io import audio
from tomatis_tpu.models.repair import cut_head, declick
from tomatis_tpu.models.standard import StandardParams, process

SR = 48000


@pytest.mark.slow
def test_config4_trim_declick_process_merge(tmp_path):
    rng = np.random.default_rng(8)
    # 60 s: 7 s silence head, music, 5 s silence tail; clicks injected.
    # The music envelope is smooth — the declicker's MAD sigma assumes a
    # roughly unimodal difference distribution (as real music gives);
    # level variation for the gate comes from a slow sine.
    n = 60 * SR
    t = np.arange(n) / SR
    env = np.zeros(n, np.float32)
    music = (t > 7.0) & (t < 55.0)
    env[music] = (0.035 * (1.0 + 0.8 * np.sin(2 * np.pi * 0.5 * t[music]))
                  ).astype(np.float32)
    x = env * (np.sin(2 * np.pi * 400 * t)
               + 0.05 * rng.standard_normal(n)).astype(np.float32)
    x = np.stack([x, 0.9 * x], 1).astype(np.float32)
    clicks = [int(20.0 * SR), int(31.3 * SR), int(44.7 * SR)]
    for c in clicks:
        x[c:c + 3] = 0.9
    raw = tmp_path / "raw.flac"
    audio.write(raw, np.clip(x, -1, 1), SR, subtype="PCM_24")

    # 1. smart trim: detect start (focus window around the real onset,
    #    like the reference's 14-19 s default around its known 16.9 s)
    #    and end of the music
    st = find_start_smart(raw, search_duration=15.0, focus=(5.0, 10.0))
    en = find_end_smart(raw, search_duration=15.0)
    assert st["candidates"] and abs(st["candidates"][0] - 7.0) < 1.0
    assert en["found"] and abs(en["end_time"] - 55.0) < 2.5
    start_cut = st["candidates"][0]
    cut = tmp_path / "cut.flac"
    cut_head(raw, cut, cut_seconds=start_cut)

    # 2. declick: all injected clicks must be found and inpainted
    clean = tmp_path / "clean.flac"
    rep = declick(cut, clean, k=12.0)
    assert rep["kept_segments"] >= len(clicks)
    y, _ = audio.read(clean)
    off = int(start_cut * SR)
    for c in clicks:
        assert np.max(np.abs(y[c - off:c - off + 3])) < 0.5

    # 3. process with the standard chain + state CSV
    out = tmp_path / "out.flac"
    st_csv = tmp_path / "state.csv"
    stats = process(clean, out, StandardParams(require_48k_stereo=False),
                    state_csv_path=st_csv)
    assert stats["c2_frames"] > 0 and stats["c1_frames"] > 0

    # 4. merge state + per-channel volume into the report CSV
    merged = tmp_path / "merged.csv"
    res = merge_state_volume(st_csv, out, merged)
    lines = open(merged, encoding="utf-8").read().strip().splitlines()
    # rows = min(state rows, in-range frames of the audio) — the audio's
    # in-range frame count excludes pad frames (reference zip semantics)
    assert len(lines) - 1 == res["n_rows"]
    assert abs(res["n_rows"] - stats["n_frames"]) <= 2
    assert lines[0].startswith("Frame,")  # bilingual header preserved
