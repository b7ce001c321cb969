"""Native FLAC codec tests: encode/decode round trips, seeks, facade."""
import numpy as np
import pytest

from tomatis_tpu.io import audio


def _sig(n=50000, ch=2, sr=48000, seed=0, amp=0.5):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = amp * np.sin(2 * np.pi * 440 * t)[:, None] * np.ones((1, ch))
    x += 0.02 * rng.standard_normal((n, ch))
    return np.clip(x, -1, 1).astype(np.float32)


@pytest.mark.parametrize("subtype,tol", [("PCM_16", 2 ** -15),
                                         ("PCM_24", 2 ** -23)])
def test_flac_roundtrip(tmp_path, subtype, tol):
    x = _sig()
    p = tmp_path / "a.flac"
    audio.write(p, x, 48000, subtype=subtype)
    meta = audio.info(p)
    assert (meta.samplerate, meta.channels, meta.frames) == (48000, 2, len(x))
    assert meta.format == "FLAC" and meta.subtype == subtype
    y, sr = audio.read(p)
    assert sr == 48000 and y.shape == x.shape
    assert np.max(np.abs(y - x)) <= tol + 1e-7


def test_flac_compresses(tmp_path):
    """A tonal signal must compress well below raw PCM size."""
    import os
    x = _sig(n=200000, amp=0.3)
    x[:, 1] = x[:, 0]  # correlated channels still encoded independently
    p = tmp_path / "c.flac"
    audio.write(p, x, 48000, subtype="PCM_24")
    raw = 200000 * 2 * 3
    assert os.path.getsize(p) < 0.9 * raw


def test_flac_seektable_random_seeks(tmp_path):
    """The encoder writes a SEEKTABLE (one point / 10 s); seeks anywhere in
    a long file must land exactly and not decode the whole prefix."""
    import time
    sr = 48000
    rng = np.random.default_rng(4)
    n = 60 * sr
    x = (0.1 * np.sin(2 * np.pi * 440 * np.arange(n) / sr)
         + 0.01 * rng.standard_normal(n)).astype(np.float32)
    xs = np.stack([x, x], 1)
    p = tmp_path / "long.flac"
    audio.write(p, xs, sr, subtype="PCM_24")
    with audio.AudioFile(p, "r") as f:
        for pos in [0, 9999, 15 * sr + 7, 35 * sr, 59 * sr, n - 5]:
            f.seek(pos)
            y = f.read(128)
            ref = xs[pos:pos + 128]
            assert y.shape == ref.shape
            np.testing.assert_allclose(y, ref, atol=2 / 8388608.0)
        t0 = time.perf_counter()
        f.seek(59 * sr)
        f.read(1)
        # nearest seek point is <= 10 s behind: far cheaper than decoding
        # the whole 59 s prefix
        assert time.perf_counter() - t0 < 1.0


def test_flac_lpc_compression_and_noise_bound(tmp_path):
    """Order-12 LPC must push pure-tonal stereo well under 40% of raw, and
    full-scale noise must stay under raw+header (regression for a uint32
    overflow in rice parameter selection that pinned k at 30 and inflated
    noisy blocks to ~130%)."""
    import os
    sr = 48000
    t = np.arange(10 * sr) / sr
    env = (0.05 + 0.04 * np.sin(2 * np.pi * 0.25 * t)).astype(np.float32)
    tonal = np.stack([env * np.sin(2 * np.pi * 440 * t),
                      env * np.sin(2 * np.pi * 441 * t)], 1).astype(np.float32)
    noise = (0.05 * np.random.default_rng(0)
             .standard_normal((5 * sr, 2))).astype(np.float32)

    pt = tmp_path / "tonal.flac"
    audio.write(pt, tonal, sr, subtype="PCM_24")
    assert os.path.getsize(pt) < 0.40 * tonal.shape[0] * 2 * 3
    yt, _ = audio.read(pt)
    assert np.max(np.abs(yt - tonal)) < 2 / 8388608.0

    pn = tmp_path / "noise.flac"
    audio.write(pn, noise, sr, subtype="PCM_24")
    assert os.path.getsize(pn) < 1.02 * noise.shape[0] * 2 * 3
    yn, _ = audio.read(pn)
    assert np.max(np.abs(yn - noise)) < 2 / 8388608.0


def test_flac_streaming_and_seek(tmp_path):
    x = _sig(n=30011)  # non-multiple of block size -> partial last frame
    p = tmp_path / "s.flac"
    with audio.AudioFile(p, "w", samplerate=44100, channels=2,
                         subtype="PCM_24") as f:
        for i in range(0, len(x), 7000):
            f.write(x[i:i + 7000])
    with audio.AudioFile(p, "r") as f:
        assert f.frames == len(x)
        chunks = []
        while True:
            c = f.read(4097)
            if len(c) == 0:
                break
            chunks.append(c)
        y = np.concatenate(chunks)
    assert y.shape == x.shape
    assert np.max(np.abs(y - x)) <= 2 ** -23 + 1e-7
    # ranged read via facade
    y2, _ = audio.read(p, frames=1000, start=12345)
    np.testing.assert_allclose(y2, y[12345:13345], atol=1e-9)


def test_flac_mono_16bit(tmp_path):
    x = _sig(n=9000, ch=1, amp=0.7)
    p = tmp_path / "m.flac"
    audio.write(p, x[:, 0], 22050, subtype="PCM_16")
    y, sr = audio.read(p, always_2d=False)
    assert sr == 22050 and y.ndim == 1 and len(y) == 9000
    assert np.max(np.abs(y - x[:, 0])) <= 2 ** -15 + 1e-7


def test_flac_write_raw_pcm24(tmp_path):
    x = _sig(n=20000)
    v = np.clip(np.rint(x * 8388608.0), -8388608, 8388607).astype(np.int32)
    flat = v.reshape(-1)
    raw = np.empty((flat.size, 3), np.uint8)
    raw[:, 0] = flat & 0xFF
    raw[:, 1] = (flat >> 8) & 0xFF
    raw[:, 2] = (flat >> 16) & 0xFF
    p = tmp_path / "r.flac"
    with audio.AudioFile(p, "w", samplerate=48000, channels=2,
                         subtype="PCM_24") as f:
        assert f.supports_raw
        f.write_raw(raw.reshape(-1))
    y, _ = audio.read(p)
    np.testing.assert_allclose(y, v.astype(np.float32) / 8388608.0, atol=1e-9)


def test_external_flac_decode(tmp_path):
    """Cross-check our decoder against an independent encoder: the system
    `flac` tool when present, otherwise the bit-level spec builder from
    test_flac_spec (written straight from the FLAC format spec) — the
    cross-validation never skips."""
    import shutil
    import subprocess
    if shutil.which("flac") is not None:
        x = _sig(n=12345)
        wav = tmp_path / "x.wav"
        audio.write(wav, x, 48000, subtype="PCM_24")
        fl = tmp_path / "x.flac"
        subprocess.run(["flac", "--silent", "-o", str(fl), str(wav)],
                       check=True)
        y, sr = audio.read(fl)
        w, _ = audio.read(wav)
        assert sr == 48000
        np.testing.assert_allclose(y, w, atol=1e-9)
        return
    from tests import test_flac_spec as spec
    B = 96
    rng = np.random.default_rng(11)
    L = np.cumsum(rng.integers(-700, 700, B)) + 2000
    R = (0.7 * L).astype(np.int64)

    def f(bw, cbps):
        spec.sub_fixed(bw, L, 2, cbps[0], k=8)
        spec.sub_fixed(bw, L - R, 1, cbps[1], k=7)
    blob = (b"fLaC" + spec.streaminfo(48000, 2, 24, B, B)
            + spec.frame(0, B, 24, 8, f))     # left/side
    p = tmp_path / "spec.flac"
    p.write_bytes(blob)
    y, sr = audio.read(p)
    exp = np.stack([L, R], 1).astype(np.float64) / 8388608.0
    assert sr == 48000
    np.testing.assert_allclose(y, exp, atol=1e-9)


def test_unknown_length_flac(tmp_path):
    """STREAMINFO total_samples=0 (legal for streamed encodes) must be
    counted at open, not read as an empty file (round-2 review finding)."""
    x = _sig(n=10000)
    p = tmp_path / "u.flac"
    audio.write(p, x, 48000, subtype="PCM_24")
    raw = bytearray(p.read_bytes())
    # STREAMINFO block body starts at byte 8; total_samples = low nibble
    # of body[13] and body[14:18]
    base = 8
    raw[base + 13] &= 0xF0
    raw[base + 14:base + 18] = b"\x00\x00\x00\x00"
    p.write_bytes(bytes(raw))
    info = audio.info(p)
    assert info.frames == len(x), info.frames
    y, sr = audio.read(p)
    assert sr == 48000 and y.shape == x.shape
    assert np.max(np.abs(y - x)) <= 2 ** -23 + 1e-7
    # seeking must also still work without the header length
    with audio.AudioFile(p) as f:
        f.seek(5000)
        z = f.read(100)
        np.testing.assert_allclose(z, y[5000:5100], atol=1e-9)


def test_pure_decoder_matches_native(tmp_path):
    """The pure-Python fallback decoder must reproduce the native decode
    bit-for-bit on our encoder's output (LPC subframes, stereo modes)."""
    from tomatis_tpu.io import flac as flac_mod
    from tomatis_tpu.io.flac_py import PureFlacReader
    cases = [
        ("lpc.flac", _sig(n=30000), "PCM_24"),
        ("silence.flac", np.zeros((8000, 2), np.float32), "PCM_24"),
        ("mono16.flac", _sig(n=9000, ch=1), "PCM_16"),
    ]
    for name, x, subtype in cases:
        p = tmp_path / name
        audio.write(p, x, 48000, subtype=subtype)
        nat = flac_mod.FlacReader(p)
        assert isinstance(nat, flac_mod._NativeFlacReader)
        pure = PureFlacReader(p)
        assert (pure.samplerate, pure.channels, pure.frames) \
            == (nat.samplerate, nat.channels, nat.frames)
        yn = nat.read_int24(-1)
        yp = pure.read_int24(-1)
        np.testing.assert_array_equal(yp, yn)
        nat.close(); pure.close()


def test_pure_decoder_spec_frames(tmp_path):
    """Pure decoder vs the bit-level spec builder (fixed subframes,
    left/side stereo) — an encoder-independent cross check."""
    from tests import test_flac_spec as spec
    from tomatis_tpu.io.flac_py import PureFlacReader
    B = 96
    rng = np.random.default_rng(11)
    L = np.cumsum(rng.integers(-700, 700, B)) + 2000
    R = (0.7 * L).astype(np.int64)

    def f(bw, cbps):
        spec.sub_fixed(bw, L, 2, cbps[0], k=8)
        spec.sub_fixed(bw, L - R, 1, cbps[1], k=7)
    blob = (b"fLaC" + spec.streaminfo(48000, 2, 24, B, B)
            + spec.frame(0, B, 24, 8, f))     # left/side
    p = tmp_path / "spec.flac"
    p.write_bytes(blob)
    r = PureFlacReader(p)
    y = r.read_int_raw(-1)
    np.testing.assert_array_equal(y, np.stack([L, R], 1).astype(np.int32))


def test_pure_decoder_seek_and_partial_reads(tmp_path):
    from tomatis_tpu.io.flac_py import PureFlacReader
    x = _sig(n=20000)
    p = tmp_path / "s.flac"
    audio.write(p, x, 48000, subtype="PCM_24")
    r = PureFlacReader(p)
    whole = r.read(-1)
    r.seek(7013)
    piece = r.read(400)
    np.testing.assert_array_equal(piece, whole[7013:7413])
    assert r.tell() == 7413
    r.seek(0)
    np.testing.assert_array_equal(r.read(100), whole[:100])


def test_flac_reader_falls_back_without_native(tmp_path, monkeypatch):
    """With native builds unavailable (TOMATIS_NO_NATIVE, fresh cache) the
    FlacReader factory must hand back the pure decoder transparently."""
    from tomatis_tpu.io import flac as flac_mod
    from tomatis_tpu.io.flac_py import PureFlacReader
    from tomatis_tpu.native import build
    x = _sig(n=6000)
    p = tmp_path / "f.flac"
    audio.write(p, x, 48000, subtype="PCM_24")
    monkeypatch.setenv("TOMATIS_NO_NATIVE", "1")
    monkeypatch.setattr(build, "_CACHE", {})
    r = flac_mod.FlacReader(p)
    assert isinstance(r, PureFlacReader)
    y = r.read(-1)
    assert np.max(np.abs(y - x)) <= 2 ** -23 + 1e-7
