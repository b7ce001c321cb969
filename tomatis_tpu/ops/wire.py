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

The same format runs in three implementations that must agree bit-for-bit:
numpy (oracle + fallback), C++ (tomatis_tpu/native/wire.cpp - the
production host side), and XLA (this file - the production device side).

Typical program material packs to ~1.5-2.2 B/sample vs 3 B raw PCM_24 and
4 B float32, which is what moves the link-bound realtime factor.

Layout (little-endian u32 words):
    word 0   magic 0x54574332 ('TWC2')
    word 1   n samples per channel
    word 2   K = ceil(n / 256) blocks per channel
    word 3   flags = channels | order << 8 | midside << 16 | raw << 17
    word 4   used_words (total length of the stream, in u32 words)
    packed:  ceil(ch*K / 4) width words (u8 per block, channel-major),
             then per-channel bitstreams, channel-major; block b holds
             w[b] PLANES ("octets") of 8 words each (w=0: block omitted,
             all-zero residuals). Plane o, word j, bit i = bit o of the
             block's residual sample 32j + (31-i), two's complement
             truncated to w bits. (The bit-reversed lane order is the
             natural output of the masked-shift bit transpose; all three
             implementations share it.)
    raw:     ceil(n*ch*3 / 4) words of interleaved sample-major
             little-endian 24-bit PCM (no width region).
"""
from __future__ import annotations


import numpy as np

MAGIC = 0x54574332
B = 256               # samples per width block
_WMAX = 30            # side channel at order 4 needs up to 25+4+1 bits


# ---------------------------------------------------------------------------
# Shared helpers (numpy)
# ---------------------------------------------------------------------------

def n_blocks(n: int) -> int:
    return -(-n // B)


def header_words(n: int, ch: int) -> int:
    """Words before the bitstreams in the packed layout."""
    return 5 + (ch * n_blocks(n) + 3) // 4


def raw_words(n: int, ch: int) -> int:
    return 5 + (n * ch * 3 + 3) // 4


def max_words(n: int, ch: int) -> int:
    """Static worst-case buffer size (packed layout cap; the raw escape
    guarantees used_words <= raw_words, but the packed layout is what the
    fixed-size device buffer must be able to hold)."""
    return header_words(n, ch) + 8 * _WMAX * ch * n_blocks(n)


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

def encode_np(v: np.ndarray) -> np.ndarray:
    """int32 PCM_24 samples [n, ch] -> packed uint8 array (exact size)."""
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
        r = x0
        for o in range(5):
            w = _widths_np(r)
            total = H + 8 * int(w.sum(dtype=np.int64))
            if best is None or total < best[0]:
                best = (total, o, ms, w, r.copy())
            r = _diff_np(r)
    total, order, ms, w, r = best

    RW = raw_words(n, ch)
    if total >= RW:
        out = np.zeros(RW * 4, np.uint8)
        _put_header(out, n, K, ch, 0, 1, RW)
        flat = v.reshape(-1)
        pcm = np.empty((flat.size, 3), np.uint8)
        pcm[:, 0] = flat & 0xFF
        pcm[:, 1] = (flat >> 8) & 0xFF
        pcm[:, 2] = (flat >> 16) & 0xFF
        out[20:20 + flat.size * 3] = pcm.reshape(-1)
        return out

    out = np.zeros(total * 4, np.uint8)
    _put_header(out, n, K, ch, (order << 8) | (ms << 16), 0, total)
    wflat = w.reshape(-1).astype(np.int64)           # [T = ch*K]
    out[20:20 + wflat.size] = wflat

    pad = K * B - n
    rp = np.pad(r, ((0, 0), (0, pad))).reshape(ch * K, B)
    z = rp.astype(np.uint32) & np.where(
        wflat > 0, (np.uint64(1) << wflat.astype(np.uint64)) - 1,
        0).astype(np.uint32)[:, None]
    planes = _planes_fwd_np(z)                       # [T, 30, 8]
    obase = np.cumsum(wflat) - wflat                 # octet offset per block
    S = int(wflat.sum())                             # total stream octets
    src_t = np.repeat(np.arange(len(wflat)), wflat)
    src_p = np.arange(S) - np.repeat(obase, wflat)
    stream = planes[src_t, src_p]                    # [S, 8]
    out[H * 4:] = stream.reshape(-1).view(np.uint8)
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
    used = int(hdr[4])
    if raw:
        if buf.size < 20 + n * ch * 3:
            raise ValueError(f"malformed wire buffer: raw payload needs "
                             f"{20 + n * ch * 3} bytes, have {buf.size}")
        pcm = buf[20:20 + n * ch * 3].reshape(-1, 3)
        v = (pcm[:, 0].astype(np.int32)
             | (pcm[:, 1].astype(np.int32) << 8)
             | (pcm[:, 2].astype(np.int32) << 16))
        v = (v << 8) >> 8
        return v.reshape(n, ch)

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
    wflat = buf[20:20 + ch * K].astype(np.int64)
    if (wflat > _WMAX).any():
        raise ValueError("malformed wire buffer: width byte > 30")
    S = int(wflat.sum())
    if used != H + 8 * S:
        raise ValueError(f"malformed wire buffer: used={used} != "
                         f"H+8*sum(w)={H + 8 * S}")
    T = ch * K
    stream = buf[H * 4:(H + 8 * S) * 4].view(np.uint32).reshape(S, 8)
    planes = np.zeros((T, _WMAX, 8), np.uint32)
    src_t = np.repeat(np.arange(T), wflat)
    src_p = np.arange(S) - np.repeat(np.cumsum(wflat) - wflat, wflat)
    planes[src_t, src_p] = stream
    z = _planes_inv_np(planes)                       # [T, 256] u32
    wb = wflat[:, None]
    sb = np.where(wb > 0, np.uint64(1) << np.maximum(wb - 1, 0)
                  .astype(np.uint64), 0).astype(np.uint32)
    sv = (z ^ sb).astype(np.int64) - sb.astype(np.int64)
    r = np.where(wb == 0, 0, sv).astype(np.int32).reshape(ch, K * B)[:, :n]
    for _ in range(order):
        r = np.cumsum(r, axis=1, dtype=np.int32)
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


def pack_device(v, n: int, ch: int):
    """Device-side encoder (traceable): v int32 [n, ch] -> (words u32
    [max_words(n, ch)], used_words i32). Zero beyond used_words.

    Mirrors encode_np exactly, including the variant tie-break (first
    minimum over [lr o0..o4, ms o0..o4]) and the raw escape.
    """
    import jax
    import jax.numpy as jnp

    K = n_blocks(n)
    H = header_words(n, ch)
    RW = raw_words(n, ch)
    M = max_words(n, ch)
    pad = K * B - n
    T = ch * K
    S_max = _WMAX * T                                # (M - H) / 8 octets

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
    total = totals[bi].astype(jnp.int32)

    # ---- packed layout: bit-plane transform + one octet row gather ----
    # Per block: 5 masked-shift rounds turn 256 w-bit residuals into w
    # 8-word planes (dense vector ops); compaction is one row gather at
    # octet (8-word) granularity driven by a cummax-scan of per-block
    # offsets. No per-sample scatter (measured ~100 ms/chunk on v5e).
    wflat = w.reshape(T)
    rp = jnp.pad(r, ((0, 0), (0, pad))).reshape(T, B)
    z = rp.astype(jnp.uint32) & jnp.where(
        wflat > 0, (jnp.uint32(1) << wflat.astype(jnp.uint32)) - 1,
        0)[:, None]
    X = _bit_transpose32_jnp(z.reshape(T, 8, 32))          # [t, j, l]
    planes = jnp.swapaxes(X[:, :, ::-1], 1, 2)[:, :_WMAX]  # [t, o, j]
    planes_flat = jnp.concatenate(
        [planes.reshape(T * _WMAX, 8),
         jnp.zeros((1, 8), jnp.uint32)])                   # +1: masked rows
    obase = jnp.cumsum(wflat) - wflat                      # [T]
    S_tot = jnp.sum(wflat)
    # slot s belongs to block t(s): idx = s + corr[t(s)] with
    # corr[t] = 30*t - obase[t], nondecreasing (w <= 30), recovered per
    # slot by a max-scan over block-start scatters
    corr = _WMAX * jnp.arange(T, dtype=jnp.int32) - obase
    marks = jnp.zeros(S_max, jnp.int32).at[
        jnp.where(wflat > 0, obase, S_max)].max(corr, mode="drop")
    corr_s = jax.lax.cummax(marks)
    s = jnp.arange(S_max, dtype=jnp.int32)
    idx = jnp.where(s < S_tot, s + corr_s, T * _WMAX)
    stream = planes_flat[idx].reshape(-1)                  # [S_max * 8]

    # header + widths (static-length prefix)
    w8 = jnp.pad(wflat.astype(jnp.uint32), (0, (H - 5) * 4 - T))
    w4 = w8.reshape(-1, 4)
    wwords = (w4[:, 0] | (w4[:, 1] << 8) | (w4[:, 2] << 16)
              | (w4[:, 3] << 24))

    # ---- raw escape layout ----
    flat = v.reshape(-1)
    pcm = jnp.stack([flat & 255, (flat >> 8) & 255, (flat >> 16) & 255],
                    axis=-1).astype(jnp.uint32).reshape(-1)
    pcm = jnp.pad(pcm, (0, (RW - 5) * 4 - pcm.size)).reshape(-1, 4)
    rawwords = (pcm[:, 0] | (pcm[:, 1] << 8) | (pcm[:, 2] << 16)
                | (pcm[:, 3] << 24))

    use_raw = (total >= RW).astype(jnp.uint32)
    used = jnp.where(use_raw == 1, RW, total).astype(jnp.uint32)
    flags = (jnp.uint32(ch) | (order << 8) | (ms << 16)
             | (use_raw << 17)) * jnp.uint32(1)
    flags = jnp.where(use_raw == 1, jnp.uint32(ch) | (use_raw << 17), flags)
    hdr = jnp.stack([jnp.uint32(MAGIC), jnp.uint32(n), jnp.uint32(K),
                     flags, used])

    body_p = jnp.concatenate([wwords.astype(jnp.uint32), stream])
    body_r = jnp.pad(rawwords.astype(jnp.uint32), (0, M - 5 - (RW - 5)))
    mr = jnp.arange(M - 5, dtype=jnp.int32)
    body = jnp.where(use_raw == 1,
                     jnp.where(mr < RW - 5, body_r, 0),
                     body_p)
    out = jnp.concatenate([hdr, body])
    return out, used.astype(jnp.int32)


def unpack_device(buf, n: int, ch: int):
    """Device-side decoder (traceable): buf uint8 [>= used bytes, mult of
    4] -> float32 [n, ch] (PCM_24 scale v / 2^23). Order/midside/raw flags
    are data-dependent; all handled with lax.switch / where."""
    import jax
    import jax.numpy as jnp

    K = n_blocks(n)
    H = header_words(n, ch)
    T = ch * K
    words = jax.lax.bitcast_convert_type(
        buf.reshape(-1, 4), jnp.uint32).reshape(-1)
    W = words.size
    flags = words[3]
    order = ((flags >> 8) & 0xFF).astype(jnp.int32)
    ms = (flags >> 16) & 1
    raw = (flags >> 17) & 1

    def packed_branch(_):
        t = jnp.arange(T)
        wflat = ((words[5 + t // 4] >> (8 * (t % 4).astype(jnp.uint32)))
                 & 255).astype(jnp.int32)
        wflat = jnp.minimum(wflat, _WMAX)     # corrupt widths: clamp
        obase = jnp.cumsum(wflat) - wflat
        # One 240-word contiguous gather per BLOCK (each block's stream
        # region is contiguous: 8*w words at H + 8*obase): a 960-byte
        # slice fills the TPU's 512-byte lane tiles, where 8-word octet
        # gathers ran at element speed (~80M/s, measured 3x the rest of
        # the unpack). Over-read into the next blocks' data is masked.
        blkw = 8 * _WMAX
        wpad = jnp.concatenate([words, jnp.zeros(blkw, jnp.uint32)])
        starts = jnp.minimum(H + 8 * obase, W).astype(jnp.int32)
        win = jax.lax.gather(
            wpad, starts[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(blkw,), indices_are_sorted=True,
            mode=jax.lax.GatherScatterMode.CLIP)           # [T, 240]
        o = jnp.arange(_WMAX, dtype=jnp.int32)[None, :]
        valid = o < wflat[:, None]                         # [T, 30]
        planes = jnp.where(valid[:, :, None],
                           win.reshape(T, _WMAX, 8), 0)
        Xr = jnp.concatenate(
            [planes, jnp.zeros((T, 32 - _WMAX, 8), jnp.uint32)], 1)
        X = jnp.swapaxes(Xr, 1, 2)[:, :, ::-1]             # [t, j, l]
        z = _bit_transpose32_jnp(X).reshape(T, B)
        wb = wflat[:, None]
        sb = jnp.where(wb > 0,
                       jnp.uint32(1) << jnp.maximum(wb - 1, 0)
                       .astype(jnp.uint32), 0)
        sv = (z ^ sb).astype(jnp.int32) - sb.astype(jnp.int32)
        r = jnp.where(wb == 0, 0, sv).reshape(ch, K * B)[:, :n]

        def mk(o_):
            def f(x):
                for _ in range(o_):
                    x = jnp.cumsum(x, axis=1, dtype=jnp.int32)
                return x
            return f
        x = jax.lax.switch(jnp.clip(order, 0, 4),
                           [mk(o_) for o_ in range(5)], r)
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
