"""Wire codec: three-way parity (numpy oracle / XLA device / native C++).

The host<->device link format must be bit-identical across all three
implementations — the engine mixes them freely (C++ encodes input, XLA
decodes on device; XLA encodes output, C++ decodes on host)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tomatis_tpu.io import wirecodec
from tomatis_tpu.ops import wire


def _signals():
    rng = np.random.default_rng(42)
    n = 5000
    t = np.arange(n)
    x = (3e5 * np.sin(2 * np.pi * 440 * t / 48000)
         + 2e4 * rng.standard_normal(n)).astype(np.int64)
    L = np.clip(x, -8388608, 8388607).astype(np.int32)
    R = np.clip(0.9 * x, -8388608, 8388607).astype(np.int32)
    yield "tonal_stereo", np.stack([L, R], 1)
    yield "white_fullscale", rng.integers(
        -8388608, 8388608, (3000, 2)).astype(np.int32)
    yield "silence", np.zeros((1000, 2), np.int32)
    yield "mono", np.clip(1e4 * rng.standard_normal(700),
                          -8e6, 8e6).astype(np.int32)[:, None]
    yield "tiny", rng.integers(-100, 100, (5, 2)).astype(np.int32)
    yield "extremes", np.array([[8388607, -8388608]] * 300, np.int32)
    yield "minus_one", np.full((600, 2), -1, np.int32)
    ramp = (np.arange(2000) * 1000 % 16777216 - 8388608).astype(np.int32)
    yield "ramp", np.stack([ramp, -ramp], 1)
    quiet = (50 * np.sin(2 * np.pi * 300 * np.arange(4000) / 48000)) \
        .astype(np.int32)
    yield "quiet_identical_lr", np.stack([quiet, quiet], 1)
    for k in range(8):
        nn = int(rng.integers(1, 3000))
        cc = int(rng.integers(1, 3))
        amp = 10 ** rng.uniform(0, 7)
        yield f"fuzz{k}", np.clip(amp * rng.standard_normal((nn, cc)),
                                  -8388608, 8388607).astype(np.int32)
    # exact block-grid boundaries (B=256): the device pack's blocked diff
    # carries the previous block's last sample across the block edge and
    # masks the pad region — one-off errors there change the chosen
    # widths/order and break byte identity with the oracle
    for nn in (255, 256, 257, 511, 512, 513):
        big = np.clip(3e6 * rng.standard_normal((nn, 2)),
                      -8388608, 8388607).astype(np.int32)
        big[-1] = 8388607          # large step right at the block edge
        yield f"blockedge{nn}", big
    # zero-width blocks INTERLEAVED with loud ones (B=256 grid): the
    # pack's stream compaction skips empty pieces mid-stream — the
    # row-granularity gather must carry the correction across them
    gap = np.clip(3e6 * rng.standard_normal((2048, 2)),
                  -8388608, 8388607).astype(np.int32)
    gap[:256] = 0          # leading empty piece (marks at dst row 0)
    gap[512:1024] = 0      # two empty pieces mid-stream
    gap[1792:] = 0         # trailing empty pieces
    yield "gappy_blocks", gap
    # wasted-bits cases: common trailing zeros per (variant) channel
    yield "16bit_sourced", (rng.integers(-32768, 32768, (2000, 2))
                            .astype(np.int32) << 8)
    yield "wasted_mixed", np.stack(
        [rng.integers(-8388608, 8388608, 1500),
         rng.integers(-2048, 2048, 1500) << 12], 1).astype(np.int32)
    yield "wasted_mono", (rng.integers(-512, 512, 900)
                          .astype(np.int32) << 10)[:, None]
    yield "wasted_k23", np.stack([np.full(600, 8388607, np.int32),
                                  np.full(600, -8388608, np.int32)], 1)


@pytest.mark.parametrize("rice", [True, False], ids=["rice", "maxw"])
@pytest.mark.parametrize("name,v", list(_signals()))
def test_three_way_parity(name, v, rice):
    n, ch = v.shape
    buf = wire.encode_np(v, rice=rice)           # numpy oracle encode
    assert np.array_equal(wire.decode_np(buf), v)
    # the device pack never emits wasted bits (output-path contract);
    # its byte-identity oracle is the wasted-free host encode
    buf0 = wire.encode_np(v, rice=rice, wasted=False)
    assert np.array_equal(wire.decode_np(buf0), v)
    # NOT asserted: len(buf) <= len(buf0). The variant/order choice
    # compares PRE-rice totals, and stripping can flip it to a candidate
    # on which rice then saves slightly less (~1% on adversarial
    # correlated-stereo shapes) — both streams stay valid and parity
    # holds, so neither direction is an invariant.

    # XLA encode must produce byte-identical output (same tie-breaks)
    words, used = jax.jit(wire.pack_device, static_argnums=(1, 2, 3))(
        jnp.asarray(v), n, ch, rice)
    words, used = np.asarray(words), int(used)
    assert used * 4 == len(buf0)
    assert np.array_equal(words[:used].view(np.uint8)[:len(buf0)], buf0)
    assert not words[used:].any(), "padding beyond used_words must be zero"

    # XLA decode of the numpy-encoded buffers (with and without wasted
    # bits). The rice-enabled decoder handles either stream (block flags
    # drive it); the rice-free decoder is only contracted for rice-free
    # streams.
    decoders = (True,) if rice else (True, False)
    for src in (buf, buf0):
        pad = (-len(src)) % 4
        b = np.concatenate([src, np.zeros(pad, np.uint8)])
        for dec_rice in decoders:
            f = jax.jit(wire.unpack_device, static_argnums=(1, 2, 3))(
                jnp.asarray(b), n, ch, dec_rice)
            assert np.array_equal(np.asarray(f),
                                  v.astype(np.float32) / 8388608.0)

    # native C++ (skipped transparently if the toolchain is missing)
    if wirecodec.available():
        cbuf = wirecodec.encode_i32(v, rice=rice)
        assert np.array_equal(cbuf, buf), "C++ encode must match numpy"
        assert np.array_equal(wirecodec.decode_i32(buf, n, ch), v)
        assert np.array_equal(wirecodec.decode_i32(buf0, n, ch), v)
        pcm = wirecodec.decode_pcm24(buf, n, ch)
        flat = v.reshape(-1)
        exp = np.empty((flat.size, 3), np.uint8)
        exp[:, 0] = flat & 0xFF
        exp[:, 1] = (flat >> 8) & 0xFF
        exp[:, 2] = (flat >> 16) & 0xFF
        assert np.array_equal(pcm, exp.reshape(-1))


def test_native_lib_builds():
    assert wirecodec.available(), \
        "native wire codec must build in this image (g++ present)"


def test_encode_f32_exactness_gate():
    rng = np.random.default_rng(1)
    v = rng.integers(-8388608, 8388608, (2048, 2)).astype(np.int32)
    x = v.astype(np.float32) / 8388608.0
    buf = wirecodec.encode_f32(x)
    assert buf is not None
    assert np.array_equal(wirecodec.decode_i32(buf, 2048, 2), v)
    # non-PCM_24 floats must be rejected, not silently quantized
    assert wirecodec.encode_f32(x + np.float32(1e-8)) is None
    assert wirecodec.encode_f32(np.full((16, 2), 1.0, np.float32)) is None


def test_compression_on_program_material():
    rng = np.random.default_rng(7)
    sr = 48000
    t = np.arange(4 * sr) / sr
    x = 0.05 * (np.sin(2 * np.pi * 440 * t)
                + 0.4 * np.sin(2 * np.pi * 3100 * t)
                + 0.05 * rng.standard_normal(t.size))
    v = np.rint(np.stack([x, 0.9 * x], 1) * 8388608).astype(np.int32)
    buf = wire.encode_np(v)
    ratio = len(buf) / (v.size * 3)
    assert ratio < 0.85, f"expected compression on tonal material: {ratio}"
    assert np.array_equal(wire.decode_np(buf), v)


def _run_transport(sig, sr, transport, wire_input):
    from tomatis_tpu.engine.streaming import ChunkedStftEngine, StreamRunner
    from tomatis_tpu.models.standard import StandardParams, build_controller
    p = StandardParams(require_48k_stereo=False)
    eng = ChunkedStftEngine(p.n_fft, p.hop, 2, frames_per_chunk=16)
    r = StreamRunner(eng, build_controller(p, sr), len(sig),
                     transport=transport, wire_input=wire_input)
    outs = []
    stats = r.run(sig, on_audio=outs.append)
    return np.concatenate([o.reshape(-1) for o in outs]), stats


def test_wire_transport_matches_pcm24():
    """The wire transport must produce byte-identical output to pcm24 —
    it is the same quantized PCM stream, compressed on the link."""
    rng = np.random.default_rng(3)
    sr = 48000
    t = np.arange(int(2.5 * sr)) / sr
    env = np.where((t > 0.8) & (t < 1.7), 0.05, 0.002)
    x = env * (np.sin(2 * np.pi * 1000 * t)
               + 0.5 * np.sin(2 * np.pi * 4000 * t)
               + 0.02 * rng.standard_normal(t.size))
    sig = np.stack([x, 0.9 * x], 1).astype(np.float32)
    sig = (np.rint(sig * 8388608) / 8388608).astype(np.float32)

    b_pcm, _ = _run_transport(sig, sr, "pcm24", False)
    b_wire, s_wire = _run_transport(sig, sr, "wire", False)
    assert np.array_equal(b_pcm, b_wire)
    assert 0 < s_wire["wire"]["out_bytes"] < len(b_pcm), \
        "wire must actually compress this material"

    b_wi, s_wi = _run_transport(sig, sr, "wire", True)
    assert np.array_equal(b_pcm, b_wi), "wire input path changed output"
    assert s_wi["wire"]["in_bytes"] > 0

    # non-PCM_24-exact input must fall back to f32 transfers, not quantize
    _, s_f = _run_transport(sig + np.float32(1.1e-8), sr, "wire", True)
    assert s_f["wire"]["in_raw_chunks"] > 0


def test_wire_transport_fullscale_noise_end_to_end():
    """Near-full-scale white noise: the +-15 dB boost saturates the
    device PCM_24 quantizer and trips the per-flush clamp (the
    float-ref re-encode fallback) — the wire transport must stay
    byte-identical to pcm24 through all of it. (The raw escape itself is
    exercised at codec level by the white_fullscale parity case; the
    engine's post-quantization stream saturates and still compresses.)"""
    rng = np.random.default_rng(11)
    sr = 48000
    sig = (rng.integers(-7500000, 7500000, (int(1.5 * sr), 2))
           .astype(np.float32) / 8388608.0)
    sig = (np.rint(sig * 8388608) / 8388608).astype(np.float32)
    b_pcm, _ = _run_transport(sig, sr, "pcm24", False)
    b_wire, s_wire = _run_transport(sig, sr, "wire", True)
    assert np.array_equal(b_pcm, b_wire)
    assert s_wire["wire"]["out_bytes"] > 0


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        wire.decode_np(np.zeros(64, np.uint8))
    if wirecodec.available():
        with pytest.raises(RuntimeError):
            wirecodec.decode_i32(np.zeros(64, np.uint8), 16, 2)


def _corruptions():
    """Header corruptions every decoder must reject cleanly (no crash,
    no silent garbage): each yields (name, mutate(buf) -> bad buf)."""
    def set_flag_byte(buf, byteoff, val):
        b = buf.copy()
        b[byteoff] = val
        return b

    # header word 3 = flags at bytes 12..15: ch | order<<8 | ms<<16 | raw<<17
    yield "order_200", lambda b: set_flag_byte(b, 13, 200)
    yield "midside_on_mono", lambda b: set_flag_byte(b, 14, 1)
    yield "truncated", lambda b: b[:max(24, len(b) - 8)]

    def raw_too_short(b):
        bb = b.copy()
        bb[14] = bb[14] | 2            # raw flag (bit 17 = byte14 bit1)
        return bb[:40]
    yield "raw_truncated", raw_too_short


@pytest.mark.parametrize("name,mutate", list(_corruptions()))
def test_decoders_reject_corrupt_headers(name, mutate):
    """numpy fallback and native C++ must both reject the same corrupt
    buffers with a clean error — not IndexError/crash/silent garbage
    (the numpy path previously ran 200 cumsums on order=200 and crashed
    with IndexError on a midside mono buffer)."""
    v = (1000 * np.sin(np.arange(900) / 7)).astype(np.int32)[:, None]
    good = wire.encode_np(v)
    assert np.array_equal(wire.decode_np(good), v)
    bad = mutate(good)
    with pytest.raises(ValueError):
        wire.decode_np(bad)
    if wirecodec.available():
        with pytest.raises(RuntimeError):
            wirecodec.decode_i32(bad, len(v), 1)


def test_native_raw_escape_negative_samples():
    """Raw-escape decode of negative (sign-bit) samples: previously UB via
    signed (v << 8) in C++; must round-trip exactly in both decoders."""
    rng = np.random.default_rng(7)
    v = rng.integers(-8388608, 8388608, (2048, 2)).astype(np.int32)
    buf = wire.encode_np(v)
    flags = buf[12:16].view(np.uint32)[0]
    assert (flags >> 17) & 1 == 1, "full-scale noise must hit raw escape"
    assert np.array_equal(wire.decode_np(buf), v)
    if wirecodec.available():
        assert np.array_equal(wirecodec.decode_i32(buf, len(v), 2), v)


def test_malformed_overflow_stream_np_cpp_parity(tmp_path):
    """A descriptor-valid stream whose residuals overflow int32 during
    predictor restore must decode IDENTICALLY in numpy (int32 wrap) and
    C++ (unsigned wrap — UB before the fix): the two production host
    decoders may never diverge on hostile input."""
    from tomatis_tpu.io import wirecodec
    from tomatis_tpu.ops import wire

    n, ch = 256, 1
    H = wire.header_words(n, ch)
    used = H + 8 * 30                     # one block, noct=30, no rice
    hdr = np.zeros(5, np.uint32)
    hdr[0] = wire.MAGIC
    hdr[1] = n
    hdr[2] = 1
    hdr[3] = ch | (4 << 8)                # order=4: four cumsum passes
    hdr[4] = used
    desc = np.zeros((H - 5) * 4, np.uint8)
    desc[0] = 30                          # noct=30, rice bit clear
    body = np.full(8 * 30, 0xFFFFFFFF, np.uint32)
    buf = np.concatenate([hdr.view(np.uint8), desc, body.view(np.uint8)])

    ref = wire.decode_np(buf)
    assert ref.shape == (n, ch)
    if wirecodec.available():
        got = wirecodec.decode_i32(buf, n, ch)
        np.testing.assert_array_equal(got, ref)


def test_native_flac_encoder_rejects_unsupported_depth(tmp_path):
    """tflac_open_write must refuse depths its sample-size code cannot
    express (e.g. 20-bit) instead of writing corrupt frames."""
    from tomatis_tpu.io import flac as flac_mod
    try:
        lib = flac_mod._lib()
    except RuntimeError:
        import pytest
        pytest.skip("no native codec")
    p = str(tmp_path / "x.flac").encode()
    assert not lib.tflac_open_write(p, 48000, 2, 20)
    assert not lib.tflac_open_write(p, 48000, 0, 24)
    h = lib.tflac_open_write(p, 48000, 2, 24)
    assert h
    lib.tflac_close_write(h)


def test_encode_f32_rejects_nonfinite_without_ub():
    """NaN/inf samples in a FLOAT-subtype chunk must reject cleanly (raw
    f32 fallback), never reach the (int)cast — UB in the C++ encoder."""
    from tomatis_tpu.io import wirecodec
    x = np.zeros((512, 2), np.float32)
    x[3, 0] = np.nan
    x[9, 1] = np.inf
    x[11, 0] = -np.inf
    assert wirecodec.encode_f32(x) is None
    # full-scale boundaries stay accepted on both implementations
    for v in (8388607 / 8388608.0, -1.0):
        full = np.full((64, 2), v, np.float32)
        assert wirecodec.encode_f32(full) is not None


def test_wasted_bits_savings_and_flags():
    """16-bit-sourced PCM_24 (low byte zero everywhere) must ship ~8
    fewer bits/sample, and the k counts must ride the flags word."""
    rng = np.random.default_rng(99)
    v = (rng.integers(-32768, 32768, (4000, 2)) << 8).astype(np.int32)
    a = wire.encode_np(v, rice=True)
    a0 = wire.encode_np(v, rice=True, wasted=False)
    assert len(a) <= 0.75 * len(a0), (len(a), len(a0))
    flags = int(a[:20].view(np.uint32)[3])
    k0, k1 = (flags >> 18) & 31, (flags >> 23) & 31
    ms = (flags >> 16) & 1
    # lr channels both have k=8; the ms mid channel has k=7, side k=8
    assert (k0, k1) == ((7, 8) if ms else (8, 8)), (k0, k1, ms)
    assert np.array_equal(wire.decode_np(a), v)


def test_wasted_bits_malformed_k_rejected():
    """Hostile k fields (k>23, or k1 set on mono) must be rejected by
    both host decoders, and must not crash the device decoder."""
    v = np.arange(-300, 300, dtype=np.int32)[:, None] * 2
    a = wire.encode_np(v, rice=True)
    n, ch = 600, 1
    for bad_flags in ((25 << 18), (1 << 23)):   # k0=25 / k1 on mono
        corr = a.copy()
        w = corr[:20].view(np.uint32)
        w[3] = np.uint32(int(w[3]) | bad_flags)
        with pytest.raises(ValueError):
            wire.decode_np(corr)
        if wirecodec.available():
            with pytest.raises(RuntimeError):
                wirecodec.decode_i32(corr, n, ch)
        pad = (-len(corr)) % 4
        b = np.concatenate([corr, np.zeros(pad, np.uint8)])
        jax.jit(wire.unpack_device, static_argnums=(1, 2, 3))(
            jnp.asarray(b), n, ch, True)   # clamped, no crash
