"""FLAC decoder cross-validation against hand-built spec fixtures.

No independent FLAC implementation exists in this image (no `flac`,
ffmpeg, sox, libsndfile), so these tests construct FLAC streams at the
BIT level straight from the format specification (xiph.org/flac/format)
— an implementation of the *encoder side* written independently of
tomatis_tpu/native/flac.cpp — with expected PCM computed by plain-Python
predictor math. If our decoder and this builder disagree on any subframe
type, channel assignment, rice mode or edge case, the test fails.

Also: adversarial inputs exercising the bounds checks (predictor order >
block size, wasted bits >= bits-per-sample) and fuzz round-trips of our
own encoder across lengths straddling block boundaries.
"""
import numpy as np
import pytest

from tomatis_tpu.io import audio


# ---------------------------------------------------------------------------
# Bit-level FLAC builder (from the spec, independent of flac.cpp)
# ---------------------------------------------------------------------------

class BW:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v, n):
        self.acc = (self.acc << n) | (int(v) & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.bytes.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def sbits(self, v, n):
        self.bits(v & ((1 << n) - 1), n)

    def unary(self, q):
        self.bits(1, q + 1)   # q zeros then a 1

    def align(self):
        if self.n:
            self.bits(0, 8 - self.n)


def crc8(data):
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data):
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
    return c


def utf8_num(bw, num):
    assert num < 0x80, "fixtures use small frame numbers"
    bw.bits(num, 8)


def streaminfo(sr, ch, bps, total, block):
    si = BW()
    si.bits(block, 16)
    si.bits(block, 16)
    si.bits(0, 24)                 # min frame size unknown
    si.bits(0, 24)                 # max frame size unknown
    si.bits(sr, 20)
    si.bits(ch - 1, 3)
    si.bits(bps - 1, 5)
    si.bits(total, 36)
    si.bits(0, 64)                 # MD5 hi
    si.bits(0, 64)                 # MD5 lo
    body = bytes(si.bytes)
    assert len(body) == 34
    hdr = bytes([0x80, 0, 0, 34])  # last-metadata-block, STREAMINFO
    return hdr + body


def zigzag(v):
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def rice_residual(bw, res, order, bsize, k, method=0, escape=False,
                  raw_bits=18):
    """One-partition residual coding (partition order 0)."""
    bw.bits(method, 2)
    bw.bits(0, 4)                  # partition order 0
    pbits = 4 if method == 0 else 5
    if escape:
        bw.bits(0xF if method == 0 else 0x1F, pbits)
        bw.bits(raw_bits, 5)
        for v in res:
            bw.sbits(int(v), raw_bits)
        return
    bw.bits(k, pbits)
    for v in res:
        u = zigzag(int(v))
        bw.unary(u >> k)
        if k:
            bw.bits(u & ((1 << k) - 1), k)


def sub_constant(bw, value, ebps):
    bw.bits(0, 1)
    bw.bits(0, 6)
    bw.bits(0, 1)
    bw.sbits(value, ebps)


def sub_verbatim(bw, samples, ebps, wasted=0):
    bw.bits(0, 1)
    bw.bits(1, 6)
    if wasted:
        bw.bits(1, 1)
        bw.unary(wasted - 1)
    else:
        bw.bits(0, 1)
    for v in samples:
        bw.sbits(int(v) >> wasted, ebps - wasted)


def fixed_residual(samples, order):
    r = np.asarray(samples, np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def sub_fixed(bw, samples, order, ebps, k, method=0, escape=False):
    bw.bits(0, 1)
    bw.bits(8 + order, 6)
    bw.bits(0, 1)
    for v in samples[:order]:
        bw.sbits(int(v), ebps)
    rice_residual(bw, fixed_residual(samples, order), order,
                  len(samples), k, method, escape)


def sub_lpc(bw, samples, coefs, shift, prec, ebps, k):
    order = len(coefs)
    bw.bits(0, 1)
    bw.bits(32 + order - 1, 6)
    bw.bits(0, 1)
    for v in samples[:order]:
        bw.sbits(int(v), ebps)
    bw.bits(prec - 1, 4)
    bw.bits(shift, 5)
    for c in coefs:
        bw.sbits(int(c), prec)
    res = []
    s = [int(v) for v in samples]
    for i in range(order, len(s)):
        pred = sum(coefs[j] * s[i - 1 - j] for j in range(order)) >> shift
        res.append(s[i] - pred)
    rice_residual(bw, res, order, len(s), k)


def frame(num, bsize, bps, ch_asgn, build_subframes):
    """build_subframes(bw, cbps_list) writes the per-channel subframes."""
    bw = BW()
    bw.bits(0x3FFE, 14)
    bw.bits(0, 1)        # reserved
    bw.bits(0, 1)        # fixed blocking
    bw.bits(7, 4)        # bsize as 16-bit field
    bw.bits(0, 4)        # sample rate from STREAMINFO
    bw.bits(ch_asgn, 4)
    bw.bits({16: 4, 24: 6, 32: 7}[bps], 3)
    bw.bits(0, 1)        # reserved
    utf8_num(bw, num)
    bw.bits(bsize - 1, 16)
    bw.align()
    bw.bits(crc8(bytes(bw.bytes)), 8)
    if ch_asgn <= 7:
        cbps = [bps] * (ch_asgn + 1)
    elif ch_asgn == 8:
        cbps = [bps, bps + 1]     # left/side
    elif ch_asgn == 9:
        cbps = [bps + 1, bps]     # side/right
    else:
        cbps = [bps, bps + 1]     # mid/side
    build_subframes(bw, cbps)
    bw.align()
    bw.bits(crc16(bytes(bw.bytes)), 16)
    return bytes(bw.bytes)


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

def _decode(tmp_path, blob, name="fixture.flac"):
    p = tmp_path / name
    p.write_bytes(blob)
    y, sr = audio.read(p)
    return y, sr


def test_spec_constant_verbatim_fixed(tmp_path):
    """CONSTANT / VERBATIM / FIXED 0-4 subframes, rice both methods,
    escape partitions, k=0, partial last block."""
    rng = np.random.default_rng(1)
    B = 64
    frames = []
    expected = []

    # frame 0: CONSTANT left, VERBATIM right
    L0 = np.full(B, -123456)
    R0 = rng.integers(-8000, 8000, B)

    def f0(bw, cbps):
        sub_constant(bw, -123456, cbps[0])
        sub_verbatim(bw, R0, cbps[1])
    frames.append(frame(0, B, 24, 1, f0))
    expected.append(np.stack([L0, R0], 1))

    # frame 1: FIXED orders 1..4 split across two frames, various k
    base = np.cumsum(rng.integers(-300, 300, B))
    L1 = base + 1000
    R1 = np.cumsum(base) // 8

    def f1(bw, cbps):
        sub_fixed(bw, L1, 1, cbps[0], k=6)
        sub_fixed(bw, R1, 2, cbps[1], k=9, method=1)
    frames.append(frame(1, B, 24, 1, f1))
    expected.append(np.stack([L1, R1], 1))

    L2 = rng.integers(-40, 40, B).astype(np.int64)
    R2 = np.zeros(B, np.int64)    # k=0 on all-zero residuals

    def f2(bw, cbps):
        sub_fixed(bw, L2, 0, cbps[0], k=0, escape=True)  # escape partition
        sub_fixed(bw, R2, 0, cbps[1], k=0)
    frames.append(frame(2, B, 24, 1, f2))
    expected.append(np.stack([L2, R2], 1))

    # frame 3: FIXED orders 3 and 4, partial (last) block of 37 samples
    Bl = 37
    L3 = (np.arange(Bl) ** 3 - 50 * np.arange(Bl)).astype(np.int64)
    R3 = rng.integers(-100000, 100000, Bl)

    def f3(bw, cbps):
        sub_fixed(bw, L3, 3, cbps[0], k=4)
        sub_fixed(bw, R3, 4, cbps[1], k=17, method=1)  # k>14 needs 5-bit
    frames.append(frame(3, Bl, 24, 1, f3))
    expected.append(np.stack([L3, R3], 1))

    total = 3 * B + Bl
    blob = b"fLaC" + streaminfo(48000, 2, 24, total, B) + b"".join(frames)
    y, sr = _decode(tmp_path, blob)
    exp = np.concatenate(expected).astype(np.float64) / 8388608.0
    assert sr == 48000
    np.testing.assert_allclose(y, exp, atol=1e-9)


def test_spec_stereo_decorrelation_and_lpc(tmp_path):
    """L/S, S/R, M/S channel assignments + an LPC subframe + wasted bits."""
    rng = np.random.default_rng(2)
    B = 48
    t = np.arange(B)
    L = (30000 * np.sin(2 * np.pi * t / 19)).astype(np.int64)
    R = (0.8 * L + rng.integers(-500, 500, B)).astype(np.int64)
    frames = []
    expected = []

    # frame 0: left/side (ch 1 stores side = L - R at bps+1)
    def f_ls(bw, cbps):
        sub_verbatim(bw, L, cbps[0])
        sub_verbatim(bw, L - R, cbps[1])
    frames.append(frame(0, B, 24, 8, f_ls))
    expected.append(np.stack([L, R], 1))

    # frame 1: side/right (ch 0 stores side)
    def f_sr(bw, cbps):
        sub_verbatim(bw, L - R, cbps[0])
        sub_verbatim(bw, R, cbps[1])
    frames.append(frame(1, B, 24, 9, f_sr))
    expected.append(np.stack([L, R], 1))

    # frame 2: mid/side; mid = (L+R)>>1, side = L-R
    def f_ms(bw, cbps):
        sub_verbatim(bw, (L + R) >> 1, cbps[0])
        sub_verbatim(bw, L - R, cbps[1])
    frames.append(frame(2, B, 24, 10, f_ms))
    expected.append(np.stack([L, R], 1))

    # frame 3: LPC order 3 left + wasted-bits VERBATIM right
    L3 = np.cumsum(rng.integers(-2000, 2000, B)) + 5000
    R3 = (rng.integers(-30000, 30000, B) << 5)   # 5 wasted bits

    def f_lpc(bw, cbps):
        sub_lpc(bw, L3, coefs=[3, -3, 1], shift=0, prec=4, ebps=cbps[0],
                k=12)
        sub_verbatim(bw, R3, cbps[1], wasted=5)
    frames.append(frame(3, B, 24, 1, f_lpc))
    expected.append(np.stack([L3, R3], 1))

    total = 4 * B
    blob = b"fLaC" + streaminfo(48000, 2, 24, total, B) + b"".join(frames)
    y, sr = _decode(tmp_path, blob)
    exp = np.concatenate(expected).astype(np.float64) / 8388608.0
    np.testing.assert_allclose(y, exp, atol=1e-9)


def test_spec_16bit_mono(tmp_path):
    B = 32
    x = (1000 * np.sin(np.arange(B))).astype(np.int64)

    def f(bw, cbps):
        sub_fixed(bw, x, 2, cbps[0], k=8)
    blob = b"fLaC" + streaminfo(44100, 1, 16, B, B) \
        + frame(0, B, 16, 0, f)
    y, sr = _decode(tmp_path, blob)
    assert sr == 44100
    np.testing.assert_allclose(y[:, 0], x / 32768.0, atol=1e-9)


def test_spec_rejects_order_exceeding_blocksize(tmp_path):
    """An LPC/FIXED predictor order larger than the block size must be
    rejected, not written out of bounds (the round-1 advisory finding)."""
    B = 4
    x = np.arange(B, dtype=np.int64)

    def f_bad(bw, cbps):
        # FIXED order 4 warmup on a 4-sample block is legal (order == B);
        # hand-craft type 32+31 (LPC order 32) instead: order > B
        bw.bits(0, 1)
        bw.bits(32 + 31, 6)
        bw.bits(0, 1)
        for _ in range(32):
            bw.sbits(1, cbps[0])
        bw.bits(11, 4)
        bw.bits(0, 5)
        for _ in range(32):
            bw.sbits(1, 12)
        rice_residual(bw, [], 32, B, k=0)
    blob = b"fLaC" + streaminfo(48000, 1, 24, B, B) + frame(0, B, 24, 0,
                                                            f_bad)
    p = tmp_path / "bad.flac"
    p.write_bytes(blob)
    try:
        y, _ = audio.read(p)
    except Exception:
        return                      # rejected with an error: correct
    assert len(y) == 0, "decoder accepted an order-32 subframe on a " \
        "4-sample block (out-of-bounds warmup)"


def test_spec_rejects_wasted_bits_overflow(tmp_path):
    """wasted >= bits-per-sample must be rejected (ebps underflow)."""
    B = 8

    def f_bad(bw, cbps):
        bw.bits(0, 1)
        bw.bits(1, 6)       # VERBATIM
        bw.bits(1, 1)       # wasted flag
        bw.unary(30)        # wasted = 31 >= 24 bps
        for _ in range(B):
            bw.sbits(0, 1)
    blob = b"fLaC" + streaminfo(48000, 1, 24, B, B) + frame(0, B, 24, 0,
                                                            f_bad)
    p = tmp_path / "bad2.flac"
    p.write_bytes(blob)
    try:
        y, _ = audio.read(p)
    except Exception:
        return                      # rejected with an error: correct
    assert len(y) == 0, "decoder accepted wasted bits >= bits-per-sample"


def test_fuzz_roundtrip_block_boundaries(tmp_path):
    """Our encoder->decoder round trip across lengths straddling the
    encoder's block boundary, channel counts and signal classes."""
    rng = np.random.default_rng(7)
    block = 4096
    lengths = [1, 2, 37, block - 1, block, block + 1,
               2 * block - 1, 2 * block + 3]
    for i, n in enumerate(lengths):
        ch = 1 + (i % 2)
        kind = i % 3
        if kind == 0:
            v = rng.integers(-8388608, 8388608, (n, ch))
        elif kind == 1:
            t = np.arange(n)
            v = np.stack([(2e5 * np.sin(2 * np.pi * t / 100)).astype(int)]
                         * ch, 1)
        else:
            v = np.zeros((n, ch), int)
        x = (v.astype(np.float64) / 8388608.0).astype(np.float32)
        p = tmp_path / f"rt{i}.flac"
        audio.write(p, x, 48000, subtype="PCM_24")
        y, sr = audio.read(p)
        assert sr == 48000 and y.shape == x.shape
        np.testing.assert_array_equal(y, x)


def test_spec_32bit_decodes_via_pure_fallback(tmp_path):
    """32-bit stereo left/side (33-bit side channel): the native decoder
    declines these at open (int32 sample path), and FlacReader must fall
    back to the pure decoder, which reconstructs them exactly."""
    from tomatis_tpu.io.flac import FlacReader
    from tomatis_tpu.io.flac_py import PureFlacReader

    B = 16
    L = np.array([-2**31, 2**31 - 1, -7, 7, 0, -1, 1, 123456789,
                  -123456789, 2**30, -2**30, 5, -5, 42, -42, 99],
                 dtype=np.int64)
    R = np.array([2**31 - 1, -2**31, 7, -7, 1, 0, -1, -987654321,
                  987654321, -2**30, 2**30, -5, 5, -42, 42, -99],
                 dtype=np.int64)
    side = L - R                      # up to 33 significant bits

    def f(bw, cbps):
        sub_verbatim(bw, L, cbps[0])          # 32-bit
        sub_verbatim(bw, side, cbps[1])       # 33-bit
    blob = b"fLaC" + streaminfo(48000, 2, 32, B, B) + frame(0, B, 32, 8, f)
    p = tmp_path / "b32.flac"
    p.write_bytes(blob)

    r = FlacReader(p)
    assert isinstance(r, PureFlacReader)      # native declined, pure took it
    assert r.bits == 32 and r.frames == B
    got = r.read_int_raw(B)
    np.testing.assert_array_equal(got[:, 0], L)
    np.testing.assert_array_equal(got[:, 1], R)


def test_truncated_streaminfo_raises_valueerror(tmp_path):
    """A file ending inside STREAMINFO must raise ValueError (the io
    error convention), not IndexError."""
    from tomatis_tpu.io.flac_py import PureFlacReader
    whole = b"fLaC" + streaminfo(48000, 2, 24, 0, 4096)
    p = tmp_path / "trunc.flac"
    p.write_bytes(whole[:20])         # ends mid-STREAMINFO
    with pytest.raises(ValueError):
        PureFlacReader(p)


def test_spec_32bit_lpc_side_channel_exact(tmp_path):
    """The 33-bit side channel through an LPC subframe must be computed at
    full precision (regression: the LPC loop wrapped every predicted
    sample to 32 bits, corrupting exactly the streams the native decoder
    delegates to the pure decoder as its exact path). Second frame: the
    same channel with wasted bits, whose restore shift must not wrap
    either."""
    from tomatis_tpu.io.flac import FlacReader

    B = 32
    i = np.arange(B, dtype=np.int64)
    # smooth sequence above 2^31: every sample needs 33 signed bits
    side = (2 ** 31 + 1000) + 37 * i + (i * i) // 4
    assert (side >= 2 ** 31).all() and (side < 2 ** 32).all()
    L = side // 2
    R = L - side                      # decoder reconstructs R = L - S
    assert (R >= -2 ** 31).all() and (R < 2 ** 31).all()

    def f_lpc(bw, cbps):
        sub_verbatim(bw, L, cbps[0])
        sub_lpc(bw, side, coefs=[2, -1], shift=0, prec=3, ebps=cbps[1],
                k=8)

    side_w = side & ~np.int64(7)      # 3 wasted bits, still 33-bit
    R_w = L - side_w

    def f_wasted(bw, cbps):
        sub_verbatim(bw, L, cbps[0])
        sub_verbatim(bw, side_w, cbps[1], wasted=3)

    blob = (b"fLaC" + streaminfo(48000, 2, 32, 2 * B, B)
            + frame(0, B, 32, 8, f_lpc) + frame(1, B, 32, 8, f_wasted))
    p = tmp_path / "b32lpc.flac"
    p.write_bytes(blob)
    r = FlacReader(p)
    got = r.read_int_raw(2 * B)
    np.testing.assert_array_equal(got[:B, 0], L)
    np.testing.assert_array_equal(got[:B, 1], R)
    np.testing.assert_array_equal(got[B:, 0], L)
    np.testing.assert_array_equal(got[B:, 1], R_w)
