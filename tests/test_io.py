"""I/O layer tests: WAV round-trips, streaming reads/writes, facade API."""
import numpy as np
import pytest

from tomatis_tpu.io import audio


def _sig(n=4801, ch=2, sr=48000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = 0.5 * np.sin(2 * np.pi * 440 * t)[:, None]
    x = np.repeat(x, ch, axis=1) + 0.01 * rng.standard_normal((n, ch))
    return np.clip(x, -1, 1).astype(np.float32)


@pytest.mark.parametrize("subtype,tol", [
    ("PCM_16", 2 ** -15), ("PCM_24", 2 ** -23), ("PCM_32", 2 ** -30),
    ("FLOAT", 0.0),
])
def test_wav_roundtrip(tmp_path, subtype, tol):
    x = _sig()
    p = tmp_path / "a.wav"
    audio.write(p, x, 48000, subtype=subtype)
    meta = audio.info(p)
    assert (meta.samplerate, meta.channels, meta.frames) == (48000, 2, len(x))
    assert meta.subtype == subtype
    y, sr = audio.read(p)
    assert sr == 48000 and y.shape == x.shape
    assert np.max(np.abs(y - x)) <= tol + 1e-7


def test_wav_streaming_read_write(tmp_path):
    x = _sig(n=10000)
    p = tmp_path / "s.wav"
    with audio.AudioFile(p, "w", samplerate=48000, channels=2,
                         subtype="FLOAT") as f:
        for i in range(0, len(x), 3000):
            f.write(x[i:i + 3000])
    with audio.AudioFile(p, "r") as f:
        assert f.frames == len(x)
        chunks = []
        while True:
            c = f.read(2048)
            if len(c) == 0:
                break
            chunks.append(c)
        y = np.concatenate(chunks)
    np.testing.assert_array_equal(y, x)
    # seek + ranged read
    y2, _ = audio.read(p, frames=100, start=5000)
    np.testing.assert_array_equal(y2, x[5000:5100])


def test_wav_mono_always2d(tmp_path):
    x = _sig(ch=1)
    p = tmp_path / "m.wav"
    audio.write(p, x[:, 0], 44100, subtype="PCM_16")
    y, sr = audio.read(p, always_2d=False)
    assert sr == 44100 and y.ndim == 1 and len(y) == len(x)
    y2, _ = audio.read(p)
    assert y2.shape == (len(x), 1)


def test_unsupported_extension(tmp_path):
    with pytest.raises(ValueError):
        audio.info(tmp_path / "x.mp3")


def test_wav_reopen_survives_stale_header(tmp_path):
    """A writer killed by SIGKILL never fixes the RIFF header (data_size
    stays 0); reopen must trust the bytes on disk, not the header, or
    resume truncates the whole staged file."""
    import struct

    from tomatis_tpu.io.wav import WavReader, WavWriter

    p = str(tmp_path / "staged.wav")
    x = _sig(n=5000, ch=2)
    w = WavWriter(p, 48000, 2, "PCM_24")
    w.write(x)
    w.close()
    # simulate the crash: zero out RIFF size + data chunk size
    with open(p, "r+b") as f:
        f.seek(4)
        f.write(struct.pack("<I", 36))      # RIFF size as if empty
        f.seek(40)
        f.write(struct.pack("<I", 0))       # data size 0
    w2 = WavWriter.reopen(p, 3000)          # keep the first 3000 frames
    w2.write(x[:100])
    w2.close()
    r = WavReader(p)
    assert r.frames == 3100
    y = r.read(-1)
    r.close()
    np.testing.assert_allclose(y[:3000], x[:3000], atol=2 / 8388608.0)
    np.testing.assert_allclose(y[3000:], x[:100], atol=2 / 8388608.0)


def test_wav_short_fmt_chunk_raises_valueerror(tmp_path):
    """A fmt chunk shorter than 16 bytes must raise ValueError (the io
    error convention), not struct.error."""
    import struct

    from tomatis_tpu.io import wav

    fmt_body = struct.pack("<HH", 1, 2)          # only 4 bytes
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    chunks += b"data" + struct.pack("<I", 0)
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    p = tmp_path / "short_fmt.wav"
    p.write_bytes(blob)
    with pytest.raises(ValueError):
        wav.WavReader(p)


def test_convert_cli_roundtrip_bit_exact(tmp_path, capsys):
    """tomatis convert: WAV -> FLAC -> WAV round trip is bit-exact on
    PCM_24 payloads (raw 24-bit path, no float in between)."""
    from tomatis_tpu.cli.convert import main as convert_main
    rng = np.random.default_rng(11)
    x = (rng.standard_normal((48000, 2)) * 0.1).astype(np.float32)
    p0 = tmp_path / "a.wav"
    p1 = tmp_path / "a.flac"
    p2 = tmp_path / "b.wav"
    audio.write(p0, x, 48000, subtype="PCM_24")
    assert convert_main(["-i", str(p0), "-o", str(p1)]) == 0
    assert convert_main(["-i", str(p1), "-o", str(p2)]) == 0
    assert "raw 24-bit copy" in capsys.readouterr().out
    y0, _ = audio.read(p0)
    y2, sr = audio.read(p2)
    assert sr == 48000
    np.testing.assert_array_equal(y0, y2)


def test_convert_cli_float_subtype(tmp_path):
    """FLOAT output goes through the float path and preserves values."""
    from tomatis_tpu.cli.convert import main as convert_main
    x = (np.linspace(-0.5, 0.5, 2000)[:, None]
         * np.ones((1, 2))).astype(np.float32)
    p0 = tmp_path / "a.wav"
    p1 = tmp_path / "b.wav"
    audio.write(p0, x, 48000, subtype="FLOAT")
    assert convert_main(["-i", str(p0), "-o", str(p1),
                         "--subtype", "FLOAT"]) == 0
    y, _ = audio.read(p1)
    np.testing.assert_allclose(y, x, atol=0)
