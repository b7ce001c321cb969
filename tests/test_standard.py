"""End-to-end parity: models.standard vs the reference-semantics oracle."""
import numpy as np
import pytest

from tests.oracle import refdsp
from tomatis_tpu.models.standard import StandardParams, process, process_array
from tomatis_tpu.io import audio
from tomatis_tpu.utils.stateio import read_state_csv


def _signal(seconds=3.0, sr=48000, seed=1):
    """Stereo tone mix with quiet/loud alternation exercising the gate."""
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    env = 0.004 + 0.25 * (np.sin(2 * np.pi * 0.7 * t) > 0)
    x = env * (np.sin(2 * np.pi * 500 * t) + 0.5 * np.sin(2 * np.pi * 3000 * t))
    x = np.stack([x, 0.8 * x + 0.01 * rng.standard_normal(n)], 1)
    return np.clip(x, -1, 1).astype(np.float32)


PARAMS = StandardParams(gate_ui=50.0, hysteresis_db=3.0, up_delay_ms=250.0,
                        require_48k_stereo=False)


@pytest.mark.parametrize("seconds,fpc", [(2.0, 1024), (3.5, 37)])
def test_output_parity_vs_oracle(seconds, fpc):
    x = _signal(seconds)
    y, stats = process_array(x, 48000, PARAMS, frames_per_chunk=fpc)
    y_ref, states_ref, _ = refdsp.process_standard_loop(x, 48000)
    assert y.shape == x.shape == y_ref.shape
    assert np.max(np.abs(y - y_ref)) < 2e-4
    n_frames = stats["n_frames"]
    assert n_frames == len(states_ref)
    assert stats["c2_frames"] == int(np.sum(states_ref == 2))


def test_flush_clamp_parity():
    """Loud signal >0.999 peak exercises the per-flush clamp on a file long
    enough to hit the 5 s flush threshold (flush boundaries matter)."""
    sr = 48000
    x = _signal(8.0)
    x = np.clip(x * 4.0, -1, 1).astype(np.float32)  # force clipping region
    y, _ = process_array(x, sr, PARAMS, frames_per_chunk=64)
    y_ref, _, _ = refdsp.process_standard_loop(x, sr)
    assert np.max(np.abs(y)) <= 0.999 + 1e-6
    assert np.max(np.abs(y - y_ref)) < 2e-4


def test_output_gain_db():
    x = _signal(1.0) * 0.05
    p = StandardParams(output_gain_db=6.0, require_48k_stereo=False)
    p0 = StandardParams(require_48k_stereo=False)
    y1, _ = process_array(x, 48000, p)
    y0, _ = process_array(x, 48000, p0)
    np.testing.assert_allclose(y1, y0 * 10 ** (6 / 20.0), atol=1e-5)


def test_file_pipeline_and_state_csv(tmp_path):
    sr = 48000
    x = _signal(2.0)
    ip = tmp_path / "in.wav"
    op = tmp_path / "out.wav"
    cp = tmp_path / "state.csv"
    audio.write(ip, x, sr, subtype="FLOAT")
    stats = process(ip, op, PARAMS, state_csv_path=cp)
    meta = audio.info(op)
    assert meta.frames == len(x) and meta.channels == 2
    assert meta.subtype == "PCM_24"

    csvd = read_state_csv(cp)
    _, states_ref, rows_ref = refdsp.process_standard_loop(x, sr)
    assert len(csvd["frame_idx"]) == len(rows_ref)
    # frame_idx includes pad frames: first logged is pad//hop
    assert csvd["frame_idx"][0] == rows_ref[0][0] == 2048 // 2048
    np.testing.assert_allclose(csvd["time_sec"],
                               [r[1] for r in rows_ref], atol=1e-9)
    np.testing.assert_allclose(csvd["level_dbfs"],
                               [r[2] for r in rows_ref], atol=0.01)
    assert list(csvd["state"]) == [r[3] for r in rows_ref]


def test_requires_48k_stereo(tmp_path):
    x = _signal(0.5)[:, :1]
    ip = tmp_path / "mono.wav"
    audio.write(ip, x, 48000)
    with pytest.raises(ValueError):
        process(ip, tmp_path / "o.wav", StandardParams())


def test_short_file_smaller_than_fft():
    x = _signal(0.02)  # 960 samples < n_fft
    y, stats = process_array(x, 48000, PARAMS)
    assert y.shape == x.shape


def test_output_parity_hop_quarter():
    """n_fft/hop = 4: the OLA tail spans 3 hop blocks, exercising the
    partial-final-chunk emit slicing and the pallas k=4 mapping."""
    x = _signal(2.3)
    p = StandardParams(require_48k_stereo=False, n_fft=4096, hop=1024)
    y, stats = process_array(x, 48000, p, frames_per_chunk=29)
    y_ref, states_ref, _ = refdsp.process_standard_loop(
        x, 48000, n_fft=4096, hop=1024)
    assert y.shape == y_ref.shape
    assert stats["c2_frames"] == int(np.sum(states_ref == 2))
    assert np.max(np.abs(y - y_ref)) < 2e-4


def test_output_parity_small_fft():
    """n_fft=1024/hop=512 (the reference's speed setting family)."""
    x = _signal(1.7)
    p = StandardParams(require_48k_stereo=False, n_fft=1024, hop=512)
    y, stats = process_array(x, 48000, p, frames_per_chunk=64)
    y_ref, _, _ = refdsp.process_standard_loop(x, 48000, n_fft=1024, hop=512)
    assert np.max(np.abs(y - y_ref)) < 2e-4


def test_silence_and_fullscale_inputs():
    """Digital silence must come out as exact silence (no NaN/Inf from the
    eps-guarded level math or the OLA normalizer); sustained full-scale
    square must survive the +-15 dB tilt via the per-flush clamp."""
    sr = 48000
    zeros = np.zeros((sr * 2, 2), np.float32)
    y, stats = process_array(zeros, sr, StandardParams(require_48k_stereo=False),
                             frames_per_chunk=16)
    assert np.all(np.isfinite(y)) and np.max(np.abs(y)) == 0.0
    assert stats["c2_frames"] == 0      # silence is all C1

    square = np.sign(np.sin(2 * np.pi * 500 *
                            np.arange(sr * 6) / sr)).astype(np.float32)
    x = np.stack([square, square], 1)
    y, _ = process_array(x, sr, StandardParams(require_48k_stereo=False),
                         frames_per_chunk=64)
    assert np.all(np.isfinite(y))
    assert np.max(np.abs(y)) <= 0.999 + 1e-6   # per-flush clamp engaged


def test_mono_file_end_to_end(tmp_path):
    """--allow_any_rate lifts the stereo requirement; a mono file must
    round-trip with the correct length and realized tilt."""
    sr = 48000
    t = np.arange(2 * sr) / sr
    x = (0.05 * (np.sin(2 * np.pi * 4000 * t))).astype(np.float32)[:, None]
    ip = tmp_path / "mono.wav"
    audio.write(ip, x, sr, subtype="PCM_24")
    op = tmp_path / "mono_out.wav"
    stats = process(ip, op, StandardParams(require_48k_stereo=False),
                    frames_per_chunk=16)
    y, _ = audio.read(op)
    assert y.shape == x.shape
    # constant -30 dBFS level > Ton -38.5 after up-delay -> mostly C2:
    # 4 kHz sits on the +15 dB plateau; expect clear boost mid-file
    s0, s1 = sr // 2, 3 * sr // 2
    gain = 20 * np.log10(np.sqrt(np.mean(y[s0:s1] ** 2))
                         / np.sqrt(np.mean(x[s0:s1] ** 2)))
    assert stats["c2_frames"] > stats["c1_frames"]
    assert 13.0 < gain < 15.5, gain
