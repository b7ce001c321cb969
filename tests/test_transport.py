"""PCM_24 device-packed transport vs the f32 path (and vs the oracle)."""
import numpy as np

from tests.oracle import refdsp
from tomatis_tpu.io import audio
from tomatis_tpu.models.standard import StandardParams, process, process_array


def _signal(seconds, sr=48000, amp=0.3):
    n = int(seconds * sr)
    t = np.arange(n) / sr
    env = 0.004 + amp * (np.sin(2 * np.pi * 0.7 * t) > 0)
    x = env * (np.sin(2 * np.pi * 500 * t) + 0.5 * np.sin(2 * np.pi * 2500 * t))
    return np.clip(np.stack([x, 0.85 * x], 1), -1, 1).astype(np.float32)


def test_pcm24_transport_matches_f32(tmp_path):
    sr = 48000
    x = _signal(2.0)
    ip = tmp_path / "in.wav"
    audio.write(ip, x, sr, subtype="FLOAT")
    p = StandardParams(require_48k_stereo=False)
    op = tmp_path / "out.wav"   # PCM_24 -> pcm24 transport
    process(ip, op, p, frames_per_chunk=64)
    y_file, _ = audio.read(op)
    y_mem, _ = process_array(x, sr, p, frames_per_chunk=64)
    # identical up to one PCM_24 LSB
    assert np.max(np.abs(y_file - y_mem)) <= 1.5 / 8388608.0


def test_pcm24_transport_clamp_path(tmp_path):
    """Hot signal forces the per-flush clamp through the int decode path;
    must match the oracle within quantization tolerance."""
    sr = 48000
    x = np.clip(_signal(8.0) * 4.0, -1, 1).astype(np.float32)
    ip = tmp_path / "in.wav"
    audio.write(ip, x, sr, subtype="FLOAT")
    p = StandardParams(require_48k_stereo=False)
    op = tmp_path / "out.wav"
    process(ip, op, p, frames_per_chunk=64)
    y_file, _ = audio.read(op)
    y_ref, _, _ = refdsp.process_standard_loop(x, sr)
    assert np.max(np.abs(y_file)) <= 0.999 + 1e-6
    assert np.max(np.abs(y_file - y_ref)) < 3e-4


def test_pcm24_transport_output_gain(tmp_path):
    sr = 48000
    x = _signal(1.0, amp=0.02)
    ip = tmp_path / "in.wav"
    audio.write(ip, x, sr, subtype="FLOAT")
    p = StandardParams(require_48k_stereo=False, output_gain_db=6.0)
    op = tmp_path / "out.wav"
    process(ip, op, p)
    y_file, _ = audio.read(op)
    y_ref, _, _ = refdsp.process_standard_loop(x, sr, output_gain_db=6.0)
    assert np.max(np.abs(y_file - y_ref)) < 3e-4


def test_process_transport_param(tmp_path):
    """process(transport=...) forces the link transport; wire and pcm24
    must be byte-identical, f32 within 1 PCM_24 LSB of them."""
    sr = 48000
    x = _signal(2.0)
    ip = tmp_path / "in.wav"
    audio.write(ip, x, sr, subtype="FLOAT")
    p = StandardParams(require_48k_stereo=False)
    outs = {}
    for tr in ("wire", "pcm24", "f32"):
        op = tmp_path / f"out_{tr}.wav"
        process(ip, op, p, frames_per_chunk=64, transport=tr)
        outs[tr], _ = audio.read(op)
    np.testing.assert_array_equal(outs["wire"], outs["pcm24"])
    assert np.max(np.abs(outs["f32"] - outs["pcm24"])) <= 1.5 / 8388608.0


def test_invalid_transport_rejected_before_output_touch(tmp_path):
    """A bad transport name must raise before the output file is opened
    (opening would truncate a pre-existing output)."""
    import pytest
    ip = tmp_path / "in.wav"
    audio.write(ip, _signal(0.5), 48000, subtype="FLOAT")
    op = tmp_path / "out.wav"
    op.write_bytes(b"precious bytes")
    p = StandardParams(require_48k_stereo=False)
    with pytest.raises(ValueError, match="transport"):
        process(ip, op, p, transport="bogus")
    assert op.read_bytes() == b"precious bytes"


def test_pcm24_transport_skips_input_codec(tmp_path):
    """--transport pcm24/f32 exist to bypass the wire codec; the input
    side must not wire-encode either."""
    sr = 48000
    ip = tmp_path / "in.wav"
    audio.write(ip, _signal(1.0), sr, subtype="PCM_24")
    p = StandardParams(require_48k_stereo=False)
    for tr, expect_wire in (("pcm24", False), ("f32", False),
                            ("wire", True)):
        stats = process(ip, tmp_path / f"o_{tr}.wav", p,
                        frames_per_chunk=16, transport=tr)
        has_wire_in = stats["wire"]["in_bytes"] > 0
        assert has_wire_in == expect_wire, (tr, stats["wire"])


def test_wire_rice_out_modes_identical_output(tmp_path, monkeypatch):
    """The rice-out policy is a LINK optimization only: executables built
    with rice on and off must produce byte-identical PCM_24 output (the
    host decoder reads the mode per block)."""
    sr = 48000
    x = _signal(2.0)
    ip = tmp_path / "in.wav"
    audio.write(ip, x, sr, subtype="PCM_24")
    p = StandardParams(require_48k_stereo=False)
    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("TOMATIS_WIRE_RICE_OUT", mode)
        op = tmp_path / f"out_{mode}.wav"
        process(ip, op, p, frames_per_chunk=64, transport="wire")
        outs[mode], _ = audio.read(op)
    np.testing.assert_array_equal(outs["0"], outs["1"])


def test_resolve_rice_out_env_force(monkeypatch):
    """TOMATIS_WIRE_RICE_OUT=0/1 forces the policy without probing the
    link; 'auto' falls back to the memoized probe/choice."""
    from tomatis_tpu.engine import streaming as S
    monkeypatch.setenv("TOMATIS_WIRE_RICE_OUT", "1")
    assert S.resolve_rice_out() is True
    monkeypatch.setenv("TOMATIS_WIRE_RICE_OUT", "0")
    assert S.resolve_rice_out() is False
    monkeypatch.delenv("TOMATIS_WIRE_RICE_OUT")
    S._RICE_OUT_MEMO["choice"] = True      # pretend a probe already ran
    assert S.resolve_rice_out() is True
    S._RICE_OUT_MEMO.clear()
