"""Wire codec: lossless PCM_24 compression for the host<->device link.

Round 1 measured the tunneled-TPU pipeline 100% link-bound: raw float32
input (4 B/sample) + raw PCM_24 output (3 B/sample) over a ~30-40 MB/s
shared link caps the standard processor near 45-50x realtime. This codec
cuts the bytes on BOTH directions with a lossless scheme chosen so that
*both* endpoints can run their half efficiently:

- residuals from the best FIXED predictor of order 0..4 (k-fold first
  difference). Restore is k cumulative sums - embarrassingly parallel,
  so the device can decode the host-encoded input with two jnp.cumsum
  calls instead of a sequential IIR (a general LPC would serialize).
- optional mid/side decorrelation (FLAC-style, integer-exact).
- per-256-sample-block fixed bit-width storage in BIT-PLANE layout
  (see below): block b stores w[b] planes of 8 words each, so blocks
  are word-aligned and the whole pack/unpack is a dense 32x32 bit
  transpose (5 masked-shift vector ops) plus ONE octet-granularity row
  gather - no per-sample scatter/gather anywhere. (The first wire
  format packed sample-major with a per-sample scatter-add; measured
  on a v5e, that scatter alone cost ~100 ms per 2M-sample chunk - the
  TPU runs element scatters at ~80M/s - while the bit-plane transform
  runs at HBM speed.)
- a raw PCM_24 escape when packing would exceed raw size.

- a per-block RICE mode when it beats the fixed width: the per-sample
  Rice code (parameter k) is SPLIT into a dense k-bit remainder field
  stored in the same bit-plane layout, plus a separate unary stream
  (terminator bitmap) — so the device side never packs variable-length
  codes: remainders ride the dense transpose, quotients one bounded
  scatter-add of terminator bits, and decode recovers quotients from
  popcount prefix sums. Measured ~4-5% fewer bytes than fixed widths on
  the bench signal (the residual is near-Gaussian, where max-width
  blocks lose ~1.75 bits/sample to the distribution's shape but an
  invertible code must still pay the sign bit back).

The same format runs in three implementations that must agree bit-for-bit:
numpy (oracle + fallback), C++ (tomatis_tpu/native/wire.cpp - the
production host side), and XLA (this file - the production device side).

Typical program material packs to ~1.5-2.2 B/sample vs 3 B raw PCM_24 and
4 B float32, which is what moves the link-bound realtime factor.

- FLAC-style WASTED BITS, per stream channel: when every sample of a
  (post-decorrelation) channel shares k trailing zero bits — 16-bit-
  sourced PCM_24 material has k=8 everywhere — the channel is stored
  right-shifted by k and the decoder shifts back after the prediction
  cumsums. Cuts such inputs by a further ~8 bits/sample; k rides the
  flags word, so a k=0 stream is byte-identical to the pre-wasted-bits
  format. Host encoders always detect it (one OR-reduce per channel);
  the device-side pack never emits it (processed audio is quantized
  from floats — common trailing zeros are measure-zero there), which
  keeps the output-path executables unchanged.

Layout (little-endian u32 words):
    word 0   magic 0x54574333 ('TWC3')
    word 1   n samples per channel
    word 2   K = ceil(n / 256) blocks per channel
    word 3   flags = channels | order << 8 | midside << 16 | raw << 17
             | k0 << 18 | k1 << 23 (k0/k1: wasted bits of stream
             channel 0/1, 0..23; defined for ch <= 2, else must be 0;
             always 0 when raw)
    word 4   used_words (total length of the stream, in u32 words)
    desc:    ceil(2*ch*K / 4) words: TWO bytes per block, channel-major.
             byte0 = rice << 7 | width (rice: remainder width k 0..24;
             maxw: plane width w in {0, 4..30}); byte1 = unary word
             count uw (rice: 8..64, else 0). Block plane length =
             8*(byte0 & 0x7F) words; unary length = byte1 words.
    planes:  ALL blocks' plane regions, channel-major, concatenated:
             8*(byte0 & 0x7F) words per block ("octets" of 8 words),
             so the region stays octet-aligned for the device's wide
             row gathers. maxw block: w planes of the residual, two's
             complement truncated to w bits; plane o, word j, bit i =
             bit o of sample 32j + (31-i) (the bit-reversed lane order
             is the natural output of the masked-shift transpose; all
             three implementations share it). rice block: k planes of
             zigzag(residual) & (2^k - 1). w/k = 0: block omitted.
    unary:   ALL rice blocks' unary regions, channel-major,
             concatenated after the planes: uw words per rice block.
             Bit p of a block's region (word p>>5, bit p&31, LSB-first)
             set iff p terminates a sample's quotient run; all 256
             samples emit codes (pad positions encode zigzag 0), so a
             region holds exactly 256 set bits and sample i's quotient
             is q_i = p_i - p_{i-1} - 1 over the ascending terminator
             positions. Residual = unzigzag((q << k) | remainder).
    raw:     ceil(n*ch*3 / 4) words of interleaved sample-major
             little-endian 24-bit PCM (no desc region).

Per-block mode decision (identical in all three implementations):
    w = max-width as before; w == 0 -> empty maxw block. Else scan
    k = 0..min(w-1, 24) ascending: U_k = 256 + sum(zigzag >> k) over all
    256 positions; k is valid iff U_k <= 2048 (uw <= 64, bounding the
    device buffers); cost_k = 8k + ceil(U_k / 32) words, first strict
    minimum wins. Rice iff some k is valid and its cost < 8w. Every
    block therefore uses <= 8*w <= 240 words, so the worst-case buffer
    bound is unchanged from the fixed-width format.
"""
from __future__ import annotations


import numpy as np

MAGIC = 0x54574333
B = 256               # samples per width block
_WMAX = 30            # side channel at order 4 needs up to 25+4+1 bits
_KMAX = 24            # rice remainder width cap
_UWMAX = 64           # rice unary region cap (words)


# ---------------------------------------------------------------------------
# Shared helpers (numpy)
# ---------------------------------------------------------------------------

def n_blocks(n: int) -> int:
    return -(-n // B)


def header_words(n: int, ch: int) -> int:
    """Words before the bitstreams in the packed layout (header + the
    2-byte-per-block desc region)."""
    return 5 + (2 * ch * n_blocks(n) + 3) // 4


def raw_words(n: int, ch: int) -> int:
    return 5 + (n * ch * 3 + 3) // 4


def max_words(n: int, ch: int) -> int:
    """Static worst-case buffer size (packed layout cap; the raw escape
    guarantees used_words <= raw_words, but the packed layout is what the
    fixed-size device buffer must be able to hold)."""
    return header_words(n, ch) + 8 * _WMAX * ch * n_blocks(n)


# byte-level PCM_24 converters live in utils.pcm (numpy-only module) so
# host I/O can use them without importing jax; re-exported here because
# the wire format is their main consumer
from tomatis_tpu.utils.pcm import i32_from_le24, le24_from_i32  # noqa: E402,F401


def _midside_fwd_np(v: np.ndarray) -> np.ndarray:
    L = v[:, 0]
    R = v[:, 1]
    return np.stack([(L + R) >> 1, L - R], 1)


def _midside_inv_np(v: np.ndarray) -> np.ndarray:
    m = v[:, 0]
    s = v[:, 1]
    L = m + ((s + (s & 1)) >> 1)
    return np.stack([L, L - s], 1)


def _diff_np(x: np.ndarray) -> np.ndarray:
    """First difference along axis 1 with implicit leading zero."""
    r = x.copy()
    r[:, 1:] -= x[:, :-1]
    return r


def _widths_np(r: np.ndarray) -> np.ndarray:
    """Per-block bit widths for residuals r [ch, n] -> [ch, K] (u8)."""
    ch, n = r.shape
    K = n_blocks(n)
    pad = K * B - n
    rp = np.pad(r, ((0, 0), (0, pad))).reshape(ch, K, B)
    u = (rp ^ (rp >> 31)).astype(np.uint32)   # NB: maps -1 -> 0 (1 bit)
    umax = u.max(axis=2)
    bits = np.frexp(umax.astype(np.float64))[1]  # exact for ints < 2^53
    w = np.maximum(4, bits + 1)
    anynz = (rp != 0).any(axis=2)
    return np.where(anynz, w, 0).astype(np.uint8)


def _bit_transpose32_np(x: np.ndarray) -> np.ndarray:
    """Masked-shift 32x32 bit transpose over the last axis (len 32, u32).

    Involution. Output y[..., l] bit i == x[..., 31-i] bit (31-l) - the
    orientation the wire stream layout is defined around."""
    x = x.astype(np.uint32)
    m = np.uint32(0x0000FFFF)
    j = 16
    while j:
        shp = x.shape[:-1]
        y = x.reshape(shp + (32 // (2 * j), 2, j))
        a = y[..., 0, :]
        b = y[..., 1, :]
        t = (a ^ (b >> np.uint32(j))) & m
        x = np.stack([a ^ t, b ^ (t << np.uint32(j))],
                     axis=-2).reshape(shp + (32,))
        j >>= 1
        m = m ^ (m << np.uint32(j))
    return x


def _planes_fwd_np(z: np.ndarray) -> np.ndarray:
    """Masked residuals z [T, 256] u32 -> plane octets [T, 30, 8] u32.

    planes[t, o, j] = plane o of samples 32j..32j+31 of block t (bit i =
    bit o of sample 32j+31-i)."""
    T = z.shape[0]
    X = _bit_transpose32_np(z.reshape(T, 8, 32))     # [t, j, l]
    # plane o lives in transform lane 31-o; reverse lanes, swap (j, o)
    return np.swapaxes(X[:, :, ::-1], 1, 2)[:, :_WMAX, :]


def _planes_inv_np(planes: np.ndarray) -> np.ndarray:
    """Plane octets [T, 30, 8] u32 -> residual values [T, 256] u32
    (masked to each block's width; callers sign-extend)."""
    T = planes.shape[0]
    Xr = np.zeros((T, 32, 8), np.uint32)
    Xr[:, :_WMAX] = planes
    X = np.swapaxes(Xr, 1, 2)[:, :, ::-1]            # [t, j, l]
    return _bit_transpose32_np(X).reshape(T, 256)


# ---------------------------------------------------------------------------
# numpy encoder / decoder (oracle + host fallback)
# ---------------------------------------------------------------------------

def _rice_plan_np(rp: np.ndarray, wflat: np.ndarray):
    """Per-block mode decision on blocked residuals rp [T, B] int32 with
    max-widths wflat [T]. Returns (rice [T] bool, k [T], uw [T], words [T])
    — the format's deterministic k search (ascending, first strict min)."""
    T = rp.shape[0]
    r64 = rp.astype(np.int64)
    zz = ((r64 << 1) ^ (r64 >> 63)).astype(np.int64)      # zigzag < 2^w
    ks = np.arange(_KMAX + 1, dtype=np.int64)
    qs = (zz[:, None, :] >> ks[None, :, None]).sum(axis=2)  # [T, K+1]
    U = B + qs
    uw = -(-U // 32)
    valid = (ks[None, :] < wflat[:, None]) & (U <= 8 * B)
    cost = np.where(valid, 8 * ks[None, :] + uw, 1 << 30)
    kbest = np.argmin(cost, axis=1)                       # first minimum
    cbest = cost[np.arange(T), kbest]
    rice = (wflat > 0) & (cbest < 8 * wflat)
    k = np.where(rice, kbest, 0).astype(np.int64)
    uwb = np.where(rice, uw[np.arange(T), kbest], 0).astype(np.int64)
    words = np.where(rice, cbest, 8 * wflat).astype(np.int64)
    return rice, k, uwb, words


def _unary_words_np(zz_row: np.ndarray, k: int, uw: int) -> np.ndarray:
    """Unary terminator words (LSB-first bits) for one rice block."""
    q = zz_row >> k
    p = np.cumsum(q + 1) - 1
    bits = np.zeros(uw * 32, np.uint8)
    bits[p] = 1
    return (bits.reshape(uw, 32).astype(np.uint32)
            << np.arange(32, dtype=np.uint32)[None, :]).sum(
        axis=1, dtype=np.uint32)


def _wasted_bits_np(xT: np.ndarray) -> np.ndarray:
    """Per-channel wasted-bit counts of a [ch, n] int32 array: the
    trailing zero bits shared by EVERY sample (tz of the OR), capped at
    23; 0 for all-zero channels and for ch > 2 (format limit)."""
    ch = xT.shape[0]
    if ch > 2 or xT.shape[1] == 0:
        return np.zeros(ch, np.int32)
    acc = np.bitwise_or.reduce(xT.astype(np.uint32), axis=1)
    out = np.zeros(ch, np.int32)
    for c in range(ch):
        a = int(acc[c])
        out[c] = min((a & -a).bit_length() - 1, 23) if a else 0
    return out


def encode_np(v: np.ndarray, rice: bool = True,
              wasted: bool = True) -> np.ndarray:
    """int32 PCM_24 samples [n, ch] -> packed uint8 array (exact size).

    rice=False disables the per-block Rice mode (every block stored at
    its fixed max width — still a valid TWC3 stream, ~4% larger on
    program material). The engine runs rice-free by default: the rice
    halves cost real serialized device time per chunk on a tunneled TPU
    (unary select/scatter), far more than the ~4% of link time the bytes
    buy back. All three implementations accept the same switch and stay
    bit-identical for either setting.

    wasted=False disables wasted-bits detection (then bit-identical to
    pack_device, which never emits it — see the module docstring).
    """
    v = np.ascontiguousarray(v, np.int32)
    if v.ndim == 1:
        v = v[:, None]
    n, ch = v.shape
    K = n_blocks(n)
    H = header_words(n, ch)

    variants = [v.T]                       # [ch, n] channel-major
    if ch == 2:
        variants.append(_midside_fwd_np(v).T)
    best = None
    for ms, x0 in enumerate(variants):
        kbits = _wasted_bits_np(x0) if wasted \
            else np.zeros(ch, np.int32)
        r = x0 >> kbits[:, None]           # exact: common trailing zeros
        for o in range(5):
            w = _widths_np(r)
            total = H + 8 * int(w.sum(dtype=np.int64))
            if best is None or total < best[0]:
                best = (total, o, ms, w, r.copy(), kbits)
            r = _diff_np(r)
    _, order, ms, w, r, kbits = best

    wflat = w.reshape(-1).astype(np.int64)           # [T = ch*K]
    pad = K * B - n
    rp = np.pad(r, ((0, 0), (0, pad))).reshape(ch * K, B)
    if rice:
        rice_f, kb, uwb, bwords = _rice_plan_np(rp, wflat)
    else:
        rice_f = np.zeros(ch * K, bool)
        kb = uwb = np.zeros(ch * K, np.int64)
        bwords = 8 * wflat
    total = H + int(bwords.sum())

    RW = raw_words(n, ch)
    if total >= RW:
        out = np.zeros(RW * 4, np.uint8)
        _put_header(out, n, K, ch, 0, 1, RW)
        from tomatis_tpu.utils.pcm import le24_from_i32
        flat = v.reshape(-1)
        out[20:20 + flat.size * 3] = le24_from_i32(flat)
        return out

    out = np.zeros(total * 4, np.uint8)
    k0 = int(kbits[0])
    k1 = int(kbits[1]) if ch == 2 else 0
    _put_header(out, n, K, ch,
                (order << 8) | (ms << 16) | (k0 << 18) | (k1 << 23),
                0, total)
    T = ch * K
    desc = np.zeros(2 * T, np.uint8)
    noct = np.where(rice_f, kb, wflat)
    desc[0::2] = (rice_f.astype(np.uint8) << 7) | noct.astype(np.uint8)
    desc[1::2] = uwb
    out[20:20 + 2 * T] = desc

    r64 = rp.astype(np.int64)
    zz = ((r64 << 1) ^ (r64 >> 63)).astype(np.int64)
    mask = np.where(noct > 0, (np.int64(1) << noct) - 1, 0)
    zsel = np.where(rice_f[:, None], zz, r64) & mask[:, None]
    planes = _planes_fwd_np(zsel.astype(np.uint32))  # [T, 30, 8]

    words = out.view(np.uint32)
    pos = H
    for t in range(T):
        no = int(noct[t])
        if no:
            words[pos:pos + 8 * no] = planes[t, :no].reshape(-1)
            pos += 8 * no
    for t in range(T):
        if rice_f[t]:
            uw = int(uwb[t])
            words[pos:pos + uw] = _unary_words_np(zz[t], int(kb[t]), uw)
            pos += uw
    return out


def _put_header(out: np.ndarray, n, K, ch, flaghi, raw, used):
    hdr = np.array([MAGIC, n, K, ch | flaghi | (raw << 17), used], np.uint32)
    out[:20] = hdr.view(np.uint8)


def decode_np(buf: np.ndarray) -> np.ndarray:
    """packed uint8 array -> int32 PCM samples [n, ch]."""
    buf = np.ascontiguousarray(buf, np.uint8)
    hdr = buf[:20].view(np.uint32)
    if hdr[0] != MAGIC:
        raise ValueError(f"bad wire magic {hdr[0]:#x}")
    n = int(hdr[1])
    K = int(hdr[2])
    flags = int(hdr[3])
    ch = flags & 0xFF
    order = (flags >> 8) & 0xFF
    ms = (flags >> 16) & 1
    raw = (flags >> 17) & 1
    k0 = (flags >> 18) & 31
    k1 = (flags >> 23) & 31
    used = int(hdr[4])
    if raw:
        if buf.size < 20 + n * ch * 3:
            raise ValueError(f"malformed wire buffer: raw payload needs "
                             f"{20 + n * ch * 3} bytes, have {buf.size}")
        return i32_from_le24(buf[20:20 + n * ch * 3]).reshape(n, ch)

    H = header_words(n, ch)
    if used < 5 or used * 4 > buf.size:   # used counts whole u32 words
        raise ValueError(f"malformed wire buffer: used={used} words vs "
                         f"{buf.size} bytes")
    if K != n_blocks(n) or ch < 1:
        raise ValueError(f"malformed wire buffer: K={K} for n={n}, "
                         f"ch={ch}")
    if order > 4:
        raise ValueError(f"malformed wire buffer: order={order} > 4")
    if ms and ch != 2:
        raise ValueError(f"malformed wire buffer: midside with ch={ch}")
    if k0 > 23 or k1 > 23 or (ch > 2 and (k0 or k1)) \
            or (ch == 1 and k1):
        raise ValueError(f"malformed wire buffer: wasted bits "
                         f"k0={k0} k1={k1} for ch={ch}")
    T = ch * K
    desc = buf[20:20 + 2 * T]
    rice = (desc[0::2] >> 7).astype(bool)
    noct = (desc[0::2] & 0x7F).astype(np.int64)
    uw = desc[1::2].astype(np.int64)
    if (noct > _WMAX).any() or (rice & (noct > _KMAX)).any():
        raise ValueError("malformed wire buffer: block width out of range")
    if (uw > _UWMAX).any() or (~rice & (uw != 0)).any() \
            or (rice & (uw < 8)).any():
        raise ValueError("malformed wire buffer: bad unary word count")
    total = int((8 * noct + uw).sum())
    if used != H + total:
        raise ValueError(f"malformed wire buffer: used={used} != "
                         f"H+sum(block words)={H + total}")
    words = buf[:used * 4].view(np.uint32)
    planes = np.zeros((T, _WMAX, 8), np.uint32)
    S = int(noct.sum())
    src_t = np.repeat(np.arange(T), noct)
    src_p = np.arange(S) - np.repeat(np.cumsum(noct) - noct, noct)
    planes[src_t, src_p] = words[H:H + 8 * S].reshape(S, 8)
    ustarts = H + 8 * S + np.cumsum(uw) - uw         # unary region offsets
    z = _planes_inv_np(planes)                       # [T, 256] u32

    r = np.zeros((T, B), np.int64)
    # maxw blocks: two's-complement sign extension by width
    mb = ~rice
    wb = noct[:, None]
    sb = np.where(wb > 0, np.int64(1) << np.maximum(wb - 1, 0), 0) \
        .astype(np.uint32)
    sv = (z ^ sb).astype(np.int64) - sb.astype(np.int64)
    r[mb] = np.where(wb[mb] == 0, 0, sv[mb])
    # rice blocks: quotients from the unary terminator bitmaps
    for t in np.nonzero(rice)[0]:
        k = int(noct[t])
        s = int(ustarts[t])
        un = words[s:s + int(uw[t])]
        bits = ((un[:, None] >> np.arange(32, dtype=np.uint32)[None, :])
                & 1).reshape(-1)
        p = np.nonzero(bits)[0]
        if len(p) != B:
            raise ValueError("malformed wire buffer: unary region must "
                             f"hold {B} terminators, found {len(p)}")
        q = np.diff(np.concatenate([[-1], p])) - 1
        u = (q.astype(np.int64) << k) | z[t].astype(np.int64)
        r[t] = (u >> 1) ^ -(u & 1)
    r = r.astype(np.int32).reshape(ch, K * B)[:, :n]
    for _ in range(order):
        r = np.cumsum(r, axis=1, dtype=np.int32)
    if k0 or k1:   # undo wasted-bits strip (before the ms inverse)
        kv = np.array([k0, k1][:ch], np.int32)[:, None]
        r = np.left_shift(r, kv)
    v = r.T
    if ms:
        v = _midside_inv_np(v)
    return np.ascontiguousarray(v)


# ---------------------------------------------------------------------------
# XLA device implementations
# ---------------------------------------------------------------------------

def _bit_transpose32_jnp(x):
    """Masked-shift 32x32 bit transpose (last axis), traceable u32."""
    import jax.numpy as jnp
    m = jnp.uint32(0x0000FFFF)
    j = 16
    while j:
        shp = x.shape[:-1]
        y = x.reshape(shp + (32 // (2 * j), 2, j))
        a = y[..., 0, :]
        b = y[..., 1, :]
        t = (a ^ (b >> j)) & m
        x = jnp.stack([a ^ t, b ^ (t << j)], axis=-2).reshape(shp + (32,))
        j >>= 1
        m = m ^ (m << j)
    return x


def pack_device(v, n: int, ch: int, rice: bool = True):
    """Device-side encoder (traceable): v int32 [n, ch] -> (words u32
    [max_words(n, ch)], used_words i32). Zero beyond used_words.

    Mirrors encode_np exactly, including the variant tie-break (first
    minimum over [lr o0..o4, ms o0..o4]) and the raw escape. rice is a
    STATIC switch: rice=False traces none of the rice machinery (the
    25-k cost scan + unary scatter measured ~1/3 of the pack's device
    time on a v5e) and emits all-maxw streams, bit-identical to
    encode_np(v, rice=False).
    """
    import jax
    import jax.numpy as jnp

    K = n_blocks(n)
    H = header_words(n, ch)
    RW = raw_words(n, ch)
    M = max_words(n, ch)
    pad = K * B - n
    T = ch * K
    S_max = 8 * _WMAX * T                            # M - H stream words

    xT = jnp.transpose(v)                                  # [ch, n]
    variants = [xT]
    if ch == 2:
        L, R = v[:, 0], v[:, 1]
        variants.append(jnp.stack([(L + R) >> 1, L - R]))

    def diff(x):
        return x - jnp.pad(x[:, :-1], ((0, 0), (1, 0)))

    # Candidate widths for all (variant, order) pairs, computed in the
    # BLOCKED layout with a cross-block diff carry: one pad+reshape per
    # variant instead of one per candidate (10 materialized 16 MB copies
    # measured ~38 ms of the pack on a v5e; the blocked chain fuses).
    thresh = jnp.asarray((1 << np.arange(3, _WMAX - 1, dtype=np.int64))
                         .astype(np.uint32))
    in_range = (jnp.arange(K * B, dtype=jnp.int32)
                .reshape(K, B) < n)[None]                  # [1, K, B]
    all_w, all_tot = [], []
    for x0 in variants:
        cur = jnp.pad(x0, ((0, 0), (0, pad))).reshape(ch, K, B)
        for o in range(5):
            u = (cur ^ (cur >> 31)).astype(jnp.uint32)
            umax = jnp.max(u, axis=2)                      # [ch, K]
            w = 4 + jnp.sum(umax[:, :, None] >= thresh[None, None, :],
                            axis=2)
            w = jnp.where(jnp.any(cur != 0, axis=2), w, 0).astype(jnp.int32)
            all_w.append(w)
            all_tot.append(H + 8 * jnp.sum(w, dtype=jnp.int32))
            if o < 4:
                # blocked first difference: shift within blocks, carry
                # the previous block's last sample; keep pad-region zeros
                prev = jnp.concatenate(
                    [jnp.zeros((ch, 1), cur.dtype), cur[:, :-1, -1]], 1)
                shifted = jnp.concatenate(
                    [prev[:, :, None], cur[:, :, :-1]], 2)
                cur = jnp.where(in_range, cur - shifted, 0)
    totals = jnp.stack(all_tot)
    bi = jnp.argmin(totals)                                # first minimum
    order = (bi % 5).astype(jnp.uint32)
    ms = (bi // 5).astype(jnp.uint32)

    # recompute the winning residual under a switch instead of stacking
    # all ten candidates (a [10, ch, n] buffer, ~170 MB per 2M-sample
    # chunk): diffs are cheap, memory is not
    def _mk(vi, oi):
        def br(_):
            rr = variants[vi]
            for _ in range(oi):
                rr = diff(rr)
            return rr
        return br
    r = jax.lax.switch(bi, [_mk(vi, oi) for vi in range(len(variants))
                            for oi in range(5)], None)
    w = jnp.stack(all_w)[bi]                               # [ch, K] (small)

    # ---- per-block mode decision (the format's deterministic k scan) ----
    wflat = w.reshape(T)
    rp = jnp.pad(r, ((0, 0), (0, pad))).reshape(T, B)
    # zigzag; |r| < 2^29 when w <= 30, so the int32 shift cannot wrap
    zz = ((rp << 1) ^ (rp >> 31)).astype(jnp.uint32)
    if rice:
        costs, Us = [], []
        for k in range(_KMAX + 1):
            # cap the summands at 8192: any capped element already exceeds
            # the 2048-bit region limit, so the validity verdict (and, for
            # valid k, the exact sum) is unchanged while int32 never
            # overflows
            U = B + jnp.sum(jnp.minimum(zz >> k, 8192).astype(jnp.int32),
                            axis=1)
            valid = (k < wflat) & (U <= 8 * B)
            costs.append(jnp.where(valid, 8 * k + (U + 31) // 32, 1 << 30))
            Us.append(U)
        costs = jnp.stack(costs, 1)                        # [T, 25]
        kbest = jnp.argmin(costs, axis=1).astype(jnp.int32)  # first minimum
        cbest = jnp.take_along_axis(costs, kbest[:, None], 1)[:, 0]
        rice_b = (wflat > 0) & (cbest < 8 * wflat)
        kb = jnp.where(rice_b, kbest, 0)
        Ub = jnp.take_along_axis(jnp.stack(Us, 1), kbest[:, None], 1)[:, 0]
        uwb = jnp.where(rice_b, (Ub + 31) // 32, 0)
        noct = jnp.where(rice_b, kb, wflat)
    else:
        rice_b = jnp.zeros(T, bool)
        kb = uwb = jnp.zeros(T, jnp.int32)
        noct = wflat
    bwords = 8 * noct + uwb                                # [T]
    total = (H + jnp.sum(bwords)).astype(jnp.int32)

    use_raw = (total >= RW).astype(jnp.uint32)
    used = jnp.where(use_raw == 1, RW, total).astype(jnp.uint32)
    flags = (jnp.uint32(ch) | (order << 8) | (ms << 16)
             | (use_raw << 17)) * jnp.uint32(1)
    flags = jnp.where(use_raw == 1, jnp.uint32(ch) | (use_raw << 17), flags)
    hdr = jnp.stack([jnp.uint32(MAGIC), jnp.uint32(n), jnp.uint32(K),
                     flags, used])

    # The body layouts live in a lax.cond so only the WINNING one runs:
    # the raw escape's 3-byte PCM relayout and the packed compaction are
    # each real device work, and the previous jnp.where select paid both
    # every chunk for a flag that almost never flips (raw wins only when
    # the packed stream out-sizes 24-bit PCM).
    PW = 8 * _WMAX                                         # 240 words
    tt = jnp.arange(T, dtype=jnp.int32)

    def _packed_body(_):
        # ---- bit-plane transform + row-granularity compaction ----
        # Per block: 5 masked-shift rounds turn 256 masked residuals
        # into noct 8-word planes (dense vector ops); rice blocks emit
        # their unary terminator words (one bounded scatter-add) into
        # the separate trailing unary region; compaction is a gather
        # driven by a cummax-scan over the pieces at fixed source
        # strides. No per-sample variable-length packing anywhere.
        mask = jnp.where(noct > 0,
                         (jnp.uint32(1) << noct.astype(jnp.uint32))
                         - jnp.uint32(1), jnp.uint32(0))
        zsel = jnp.where(rice_b[:, None], zz,
                         rp.astype(jnp.uint32)) & mask[:, None]
        X = _bit_transpose32_jnp(zsel.reshape(T, 8, 32))   # [t, j, l]
        planes = jnp.swapaxes(X[:, :, ::-1], 1, 2)[:, :_WMAX]  # [t, o, j]

        if rice:
            # unary terminator bitmap per rice block: positions p_i =
            # cumsum(q+1)-1 < 2048 for valid blocks; everything else is
            # dropped. The unary pieces have arbitrary word lengths, so
            # the stream interleave stays a word-granularity gather.
            q = zz >> kb[:, None].astype(jnp.uint32)
            p = jnp.cumsum(q + jnp.uint32(1), axis=1) - jnp.uint32(1)
            widx = (p >> 5).astype(jnp.int32)
            dest = jnp.where(rice_b[:, None] & (widx < _UWMAX),
                             tt[:, None] * _UWMAX + widx, T * _UWMAX)
            unary = jnp.zeros(T * _UWMAX, jnp.uint32) \
                .at[dest.reshape(-1)].add(
                    (jnp.uint32(1) << (p & 31)).reshape(-1),
                    mode="drop").reshape(T, _UWMAX)
            region_flat = jnp.concatenate(
                [planes.reshape(-1), unary.reshape(-1),
                 jnp.zeros(1, jnp.uint32)])
            # pieces in OUTPUT order: all blocks' plane regions, then
            # all rice blocks' unary regions (the separated TWC3 layout)
            plen = jnp.concatenate([8 * noct, uwb])        # [2T]
            psrc = jnp.concatenate([PW * tt, PW * T + _UWMAX * tt])
            pdst = jnp.cumsum(plen) - plen
            corr = psrc - pdst   # nondecreasing: lengths <= src strides
            S_tot = jnp.sum(plen)
            marks = jnp.zeros(S_max, jnp.int32).at[
                jnp.where(plen > 0, pdst, S_max)].max(corr, mode="drop")
            corr_s = jax.lax.cummax(marks)
            s = jnp.arange(S_max, dtype=jnp.int32)
            idx = jnp.where(s < S_tot, s + corr_s, region_flat.size - 1)
            stream = region_flat[idx]                      # [S_max]
        else:
            # Without rice every piece is 8*noct words at an 8-aligned
            # source offset (PW*t) AND an 8-aligned destination (a
            # cumsum of 8-word multiples), so compact 8-word ROWS:
            # single-word gathers measured ~80M elements/s on a v5e
            # (~45 ms for the S_max=3.9M-word stream of a 2M-sample
            # chunk); row gathers cut the element count 8x and each
            # element is one contiguous 32 B slice in the lane tiles.
            R_max = _WMAX * T                              # S_max // 8
            rows = jnp.concatenate(
                [planes.reshape(R_max, 8),
                 jnp.zeros((1, 8), jnp.uint32)])           # + zero row
            prow_dst = jnp.cumsum(noct) - noct
            corr_r = _WMAX * tt - prow_dst   # == word corr // 8
            rows_tot = jnp.sum(noct)
            marks = jnp.zeros(R_max, jnp.int32).at[
                jnp.where(noct > 0, prow_dst, R_max)].max(
                    corr_r, mode="drop")
            corr_s = jax.lax.cummax(marks)
            rr = jnp.arange(R_max, dtype=jnp.int32)
            idxr = jnp.where(rr < rows_tot, rr + corr_s, R_max)
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,))
            stream = jax.lax.gather(
                rows, idxr[:, None], dn, slice_sizes=(1, 8),
                indices_are_sorted=True,
                mode=jax.lax.GatherScatterMode.CLIP).reshape(S_max)

        # header + block descriptors (static-length prefix)
        b0 = (rice_b.astype(jnp.uint32) << 7) | noct.astype(jnp.uint32)
        b1 = uwb.astype(jnp.uint32)
        dbytes = jnp.stack([b0, b1], 1).reshape(2 * T)
        w8 = jnp.pad(dbytes, (0, (H - 5) * 4 - 2 * T))
        w4 = w8.reshape(-1, 4)
        wwords = (w4[:, 0] | (w4[:, 1] << 8) | (w4[:, 2] << 16)
                  | (w4[:, 3] << 24))
        return jnp.concatenate([wwords.astype(jnp.uint32), stream])

    def _raw_body(_):
        flat = v.reshape(-1)
        pcm = jnp.stack([flat & 255, (flat >> 8) & 255,
                         (flat >> 16) & 255],
                        axis=-1).astype(jnp.uint32).reshape(-1)
        pcm = jnp.pad(pcm, (0, (RW - 5) * 4 - pcm.size)).reshape(-1, 4)
        rawwords = (pcm[:, 0] | (pcm[:, 1] << 8) | (pcm[:, 2] << 16)
                    | (pcm[:, 3] << 24))
        body_r = jnp.pad(rawwords.astype(jnp.uint32),
                         (0, M - 5 - (RW - 5)))
        mr = jnp.arange(M - 5, dtype=jnp.int32)
        return jnp.where(mr < RW - 5, body_r, 0)

    body = jax.lax.cond(use_raw == 1, _raw_body, _packed_body, None)
    out = jnp.concatenate([hdr, body])
    return out, used.astype(jnp.int32)


def unpack_device(buf, n: int, ch: int, rice: bool = True,
                  padded_tail: bool = False):
    """Device-side decoder (traceable): buf uint8 [>= used bytes, mult of
    4] or uint32 words -> float32 [n, ch] (PCM_24 scale v / 2^23).
    Order/midside/raw flags are data-dependent; all handled with
    lax.switch / where.

    rice is a STATIC switch: rice=False traces none of the unary-region
    decode (terminator search + popcount select, measured the single
    most expensive piece of the whole chunk step on a v5e — ~150 ms per
    2M-sample chunk, vs single-digit ms for everything else) and is only
    correct for streams encoded with rice disabled (all-maxw blocks).
    The engine pairs encoder and decoder settings, so the contract holds
    by construction; the general host decoders accept either stream.

    padded_tail=True asserts the CALLER ships >= 8*_WMAX words of
    readable slack beyond the stream content (the engine's bucketed
    staging does), skipping the device-side zero-pad copy of the whole
    buffer that the per-block wide gathers otherwise need to stay
    aligned at the stream tail. A uint32 buf additionally skips the
    byte->word bitcast relayout."""
    import jax
    import jax.numpy as jnp

    K = n_blocks(n)
    H = header_words(n, ch)
    T = ch * K
    if buf.dtype == jnp.uint32:
        words = buf.reshape(-1)
    else:
        words = jax.lax.bitcast_convert_type(
            buf.reshape(-1, 4), jnp.uint32).reshape(-1)
    W = words.size
    flags = words[3]
    order = ((flags >> 8) & 0xFF).astype(jnp.int32)
    ms = (flags >> 16) & 1
    raw = (flags >> 17) & 1
    # wasted-bits counts (clamped: a corrupt stream must not produce an
    # out-of-range shift, which is undefined for int32)
    k0 = jnp.minimum((flags >> 18) & 31, 23).astype(jnp.int32)
    k1 = jnp.minimum((flags >> 23) & 31, 23).astype(jnp.int32)

    def packed_branch(_):
        t = jnp.arange(T)
        b0 = ((words[5 + (2 * t) // 4]
               >> (8 * ((2 * t) % 4).astype(jnp.uint32))) & 255) \
            .astype(jnp.int32)
        b1 = ((words[5 + (2 * t + 1) // 4]
               >> (8 * ((2 * t + 1) % 4).astype(jnp.uint32))) & 255) \
            .astype(jnp.int32)
        rice_b = b0 >> 7
        noct = jnp.minimum(b0 & 0x7F, _WMAX)   # corrupt widths: clamp
        uw = jnp.minimum(jnp.where(rice_b == 1, b1, 0), _UWMAX)
        # One wide contiguous gather per BLOCK from each region (240
        # plane words / 64 unary words): wide slices fill the TPU's
        # 512-byte lane tiles, where 8-word octet gathers ran at element
        # speed (~80M/s, measured 3x the rest of the unpack). Over-read
        # into the next blocks' data is masked.
        PW = 8 * _WMAX
        wpad = words if padded_tail \
            else jnp.concatenate([words, jnp.zeros(PW, jnp.uint32)])
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(),
            start_index_map=(0,))
        pstart = H + 8 * (jnp.cumsum(noct) - noct)
        win = jax.lax.gather(
            wpad, jnp.minimum(pstart, W).astype(jnp.int32)[:, None], dn,
            slice_sizes=(PW,), indices_are_sorted=True,
            mode=jax.lax.GatherScatterMode.CLIP)           # [T, 240]
        o = jnp.arange(_WMAX, dtype=jnp.int32)[None, :]
        valid = o < noct[:, None]                          # [T, 30]
        planes = jnp.where(valid[:, :, None],
                           win.reshape(T, _WMAX, 8), 0)
        Xr = jnp.concatenate(
            [planes, jnp.zeros((T, 32 - _WMAX, 8), jnp.uint32)], 1)
        X = jnp.swapaxes(Xr, 1, 2)[:, :, ::-1]             # [t, j, l]
        z = _bit_transpose32_jnp(X).reshape(T, B)
        wb = noct[:, None]
        # maxw blocks: two's-complement sign extension by width
        sb = jnp.where(wb > 0,
                       jnp.uint32(1) << jnp.maximum(wb - 1, 0)
                       .astype(jnp.uint32), 0)
        sv = (z ^ sb).astype(jnp.int32) - sb.astype(jnp.int32)
        r_maxw = jnp.where(wb == 0, 0, sv)

        if rice:
            # rice blocks: quotients from the unary terminator bitmaps via
            # popcount prefix sums — no sequential bit walking
            ustart = H + 8 * jnp.sum(noct) + jnp.cumsum(uw) - uw
            uwin = jax.lax.gather(
                wpad, jnp.minimum(ustart, W).astype(jnp.int32)[:, None],
                dn, slice_sizes=(_UWMAX,), indices_are_sorted=True,
                mode=jax.lax.GatherScatterMode.CLIP)       # [T, 64]
            uwin = jnp.where(jnp.arange(_UWMAX)[None, :] < uw[:, None],
                             uwin, 0)                      # [T, 64]
            pop = jax.lax.population_count(uwin).astype(jnp.int32)
            cum = jnp.cumsum(pop, axis=1)                  # [T, 64]
            i = jnp.arange(B, dtype=jnp.int32)
            # word holding terminator i = #{j : cum[j] <= i}
            Wi = jnp.sum((cum[:, :, None] <= i[None, None, :])
                         .astype(jnp.int32), axis=1)
            Wi = jnp.minimum(Wi, _UWMAX - 1)
            cum_excl = cum - pop
            m = i[None, :] - jnp.take_along_axis(cum_excl, Wi, axis=1)
            xw = jnp.take_along_axis(uwin, Wi, axis=1)     # [T, 256]
            # select the m-th set bit of xw: binary search on prefix
            # popcounts
            lo = jnp.zeros_like(m)
            for step in (16, 8, 4, 2, 1):
                cand = lo + step
                pmask = jnp.where(
                    cand >= 32, jnp.uint32(0xFFFFFFFF),
                    (jnp.uint32(1) << cand.astype(jnp.uint32))
                    - jnp.uint32(1))
                cnt = jax.lax.population_count(xw & pmask) \
                    .astype(jnp.int32)
                lo = jnp.where(cnt <= m, cand, lo)
            p = 32 * Wi + lo
            pprev = jnp.concatenate(
                [jnp.full((T, 1), -1, jnp.int32), p[:, :-1]], axis=1)
            qd = p - pprev - 1
            u = ((qd << jnp.minimum(wb, _KMAX)) | z.astype(jnp.int32))
            uu = u.astype(jnp.uint32)
            r_rice = ((uu >> 1).astype(jnp.int32)
                      ^ -(u & 1))
            r = jnp.where((rice_b == 1)[:, None], r_rice, r_maxw)
        else:
            r = r_maxw
        r = r.reshape(ch, K * B)[:, :n]

        def mk(o_):
            def f(x):
                for _ in range(o_):
                    x = jnp.cumsum(x, axis=1, dtype=jnp.int32)
                return x
            return f
        x = jax.lax.switch(jnp.clip(order, 0, 4),
                           [mk(o_) for o_ in range(5)], r)
        if ch <= 2:   # undo wasted-bits strip (before the ms inverse)
            kv = (jnp.stack([k0, k1])[:ch] if ch == 2
                  else k0[None])
            x = jnp.left_shift(x, kv[:, None])
        vT = jnp.transpose(x)                              # [n, ch]
        if ch == 2:
            m, sch = vT[:, 0], vT[:, 1]
            L = m + ((sch + (sch & 1)) >> 1)
            vms = jnp.stack([L, L - sch], 1)
            vT = jnp.where(ms == 1, vms, vT)
        return vT

    def raw_branch(_):
        bidx = jnp.arange(n * ch, dtype=jnp.int32) * 3

        def byte_at(k):
            pos = ((bidx + k) & 3).astype(jnp.uint32)
            return (words[jnp.clip(5 + ((bidx + k) >> 2), 0, W - 1)]
                    >> (8 * pos)) & 255

        vraw = (byte_at(0) | (byte_at(1) << 8) | (byte_at(2) << 16)) \
            .astype(jnp.int32)
        return ((vraw << 8) >> 8).reshape(n, ch)

    vfin = jax.lax.cond(raw == 1, raw_branch, packed_branch, None)
    return vfin.astype(jnp.float32) / 8388608.0
