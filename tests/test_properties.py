"""Property-based invariants (hypothesis) for the pure host-side layers:
the wire codec's three-way agreement and size bound, the PCM byte
converters, the WAV container round trip, and the flush plan's coverage
guarantees. These layers see adversarial data in production (arbitrary
user audio, truncated files), so random-structure testing earns its keep
beyond the fixed-vector suites."""
import numpy as np
from hypothesis import given, settings, strategies as st

from tomatis_tpu.ops import wire
from tomatis_tpu.io import wirecodec
from tomatis_tpu.utils import pcm

I24 = st.integers(min_value=-(1 << 23), max_value=(1 << 23) - 1)


@st.composite
def int24_signal(draw, max_frames=1400):
    """Random [n, ch] int32 arrays in PCM_24 range, biased toward the
    structures the codec keys on: constants, ramps, small residuals,
    full-scale noise, and exact block-multiple lengths."""
    ch = draw(st.sampled_from([1, 2]))
    n = draw(st.one_of(st.integers(0, max_frames),
                       st.sampled_from([0, 1, 255, 256, 257, 512, 1024])))
    kind = draw(st.sampled_from(["noise", "quiet", "ramp", "const", "mix"]))
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    if kind == "noise":
        v = rng.integers(-(1 << 23), 1 << 23, size=(n, ch))
    elif kind == "quiet":
        v = rng.integers(-300, 300, size=(n, ch))
    elif kind == "ramp":
        base = np.arange(n, dtype=np.int64)[:, None] * draw(I24) // max(n, 1)
        v = np.clip(base + rng.integers(-5, 5, size=(n, ch)),
                    -(1 << 23), (1 << 23) - 1)
    elif kind == "const":
        v = np.full((n, ch), draw(I24), np.int64)
    else:
        v = rng.integers(-(1 << 23), 1 << 23, size=(n, ch))
        v[: n // 2] //= 1 << draw(st.integers(0, 20))
    return v.astype(np.int32)


@settings(max_examples=120, deadline=None)
@given(int24_signal(), st.booleans())
def test_wire_roundtrip_and_size_bound(v, rice):
    """decode(encode(v)) == v for the numpy oracle AND the native codec,
    both agreeing bit-for-bit on the stream; the stream never exceeds
    the raw escape's size."""
    buf = wire.encode_np(v, rice=rice)          # uint8 stream bytes
    n, ch = v.shape
    assert len(buf) % 4 == 0
    assert len(buf) // 4 <= wire.raw_words(n, ch), "raw escape bound violated"
    out = wire.decode_np(buf)
    np.testing.assert_array_equal(out, v)
    if wirecodec.available():
        cbuf = wirecodec.encode_i32(v, rice=rice)
        np.testing.assert_array_equal(np.asarray(cbuf, np.uint8),
                                      np.asarray(buf, np.uint8))
        got = wirecodec.decode_i32(buf, n, ch)
        np.testing.assert_array_equal(got, v)


@settings(max_examples=200, deadline=None)
@given(st.lists(I24, min_size=0, max_size=600))
def test_pcm24_byte_converters_roundtrip(vals):
    v = np.asarray(vals, np.int32)
    b = pcm.le24_from_i32(v)
    assert len(b) == 3 * len(v)
    np.testing.assert_array_equal(pcm.i32_from_le24(b), v)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 5000), st.sampled_from([1, 2, 3]),
       st.sampled_from(["PCM_16", "PCM_24", "PCM_32", "FLOAT"]),
       st.integers(0, 2**31 - 1))
def test_wav_roundtrip(n, ch, subtype, seed):
    import os
    import tempfile
    from tomatis_tpu.io import wav
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((n, ch)) * 0.4).clip(-1, 1).astype(np.float32)
    d = tempfile.mkdtemp()
    p = os.path.join(d, "t.wav")
    w = wav.WavWriter(p, 48000, ch, subtype)
    # split writes at a random point: the writer streams
    k = int(rng.integers(0, n + 1))
    w.write(x[:k]); w.write(x[k:]); w.close()
    r = wav.WavReader(p)
    assert r.frames == n and r.channels == ch and r.subtype == subtype
    y = r.read(-1)
    r.close()
    bits = {"PCM_16": 15, "PCM_24": 23, "PCM_32": 31, "FLOAT": None}[subtype]
    tol = 0.0 if bits is None else 1.0 / (1 << bits)
    assert y.shape == x.shape
    assert np.max(np.abs(y - x), initial=0.0) <= tol


@settings(max_examples=150, deadline=None)
@given(st.integers(0, 10_000_000), st.sampled_from([4096, 2048, 1024]),
       st.sampled_from([2048, 1024, 512]))
def test_flush_plan_partitions_stream(total, n_fft, hop):
    """Cuts must tile [-pad, last_frame_end) contiguously with positive
    lengths; every cut except the last is >= the flush threshold."""
    if n_fft % hop or (n_fft // 2) % hop:
        return
    from tomatis_tpu.engine.streaming import FLUSH_THRESHOLD, flush_plan
    plan = flush_plan(total, n_fft, hop)
    if plan.n_frames <= 0:
        assert plan.cuts == []
        return
    end = -plan.pad + (plan.n_frames - 1) * hop + n_fft
    pos = -plan.pad
    for i, (start, ln) in enumerate(plan.cuts):
        assert start == pos and ln > 0
        if i < len(plan.cuts) - 1:
            assert ln >= FLUSH_THRESHOLD
        pos += ln
    assert pos == end
    # every frame the reference would emit is covered exactly once
    assert plan.pad == n_fft // 2


# ---------------------------------------------------------------------------
# Gate state machines: associative-scan forms vs the reference loop oracles
# on random level sequences clustered around the thresholds (the fixed-
# vector suites cover known adversarial cases; random sequences cover the
# composition space of the transition tables).
# ---------------------------------------------------------------------------

TON, TOFF = -38.5, -41.5
LEVELS = st.lists(
    st.sampled_from([-55.0, -41.5, -41.4, -40.0, -38.6, -38.5, -30.0]),
    min_size=1, max_size=400)


@settings(max_examples=80, deadline=None)
@given(LEVELS, st.integers(0, 5))
def test_gate_updelay_scan_matches_loop(levels, D):
    from tests.oracle import refdsp
    from tomatis_tpu.ops import gate
    hop = 2048
    lv = np.asarray(levels, np.float32)
    ref = refdsp.gate_updelay_loop(lv.astype(np.float64), TON, TOFF,
                                   D * hop, hop)
    got, _ = gate.gate_updelay(lv, TON, TOFF, D)
    np.testing.assert_array_equal(np.asarray(got), ref)


@settings(max_examples=80, deadline=None)
@given(LEVELS, st.integers(0, 8))
def test_gate_minhold_scan_matches_loop(levels, hold):
    from tests.oracle import refdsp
    from tomatis_tpu.ops import gate
    lv = np.asarray(levels, np.float32)
    ref = refdsp.gate_minhold_loop(lv.astype(np.float64), -40.0,
                                   hyst_db=3.0, min_hold_frames=hold)
    got, _ = gate.gate_minhold(lv, TON, TOFF, hold)
    np.testing.assert_array_equal(np.asarray(got), ref)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from([0.0, 1.0]), min_size=1, max_size=300),
       st.sampled_from([0.05, 0.1, 0.25, 1.0]),
       st.sampled_from([0.0, 0.3, 1.0]))
def test_alpha_ramp_matches_loop(targets, step, alpha0):
    from tests.oracle import refdsp
    from tomatis_tpu.ops import gate
    t = np.asarray(targets, np.float32)
    ref = refdsp.alpha_ramp_loop(t.astype(np.float64), step, alpha0)
    got = np.asarray(gate.alpha_ramp(t, step, alpha0))
    np.testing.assert_allclose(got, ref, atol=2e-6)


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 4000), st.integers(1, 6), st.integers(0, 2**31 - 1))
def test_rolling_reader_matches_array_slices(total, nwin, seed):
    """RollingReader windows/advance over a streamed source must equal
    plain array slicing with zero padding outside [0, total)."""
    from tomatis_tpu.utils.rolling import RollingReader
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((total, 2)).astype(np.float32)
    cur = [0]

    def read(n):
        blk = x[cur[0]:cur[0] + n]
        cur[0] += len(blk)
        return blk
    pad = int(rng.integers(0, 3000))
    rr = RollingReader(read, 2, left_pad=pad, base=-pad, block=1000)
    start = -pad
    for _ in range(nwin):
        n = int(rng.integers(1, 5000))
        w = rr.window(start, n)
        ref = np.zeros((n, 2), np.float32)
        lo, hi = max(0, start), min(total, start + n)
        if hi > lo:
            ref[lo - start:hi - start] = x[lo:hi]
        np.testing.assert_array_equal(w, ref)
        start += int(rng.integers(0, 4000))
        rr.advance(min(start, total))


@settings(max_examples=120, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(0, 120),
       st.lists(st.tuples(st.integers(0, 5000), st.integers(1, 255)),
                min_size=0, max_size=6))
def test_flac_pure_decoder_survives_corruption(seed, trunc, flips):
    """Truncations and byte-flips of a valid FLAC stream must yield data
    or a controlled error (ValueError/EOFError/IndexError wrapped),
    never a hang, crash, or unbounded allocation."""
    import os
    import tempfile
    from tomatis_tpu.io import flac, flac_py
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((2000, 2)) * 0.3).clip(-1, 1).astype(np.float32)
    d = tempfile.mkdtemp()
    p = os.path.join(d, "t.flac")
    try:
        w = flac.FlacWriter(p, 48000, 2, "PCM_24")
    except Exception:
        return  # no compiler: the native encoder is unavailable here
    w.write(x)
    w.close()
    blob = bytearray(open(p, "rb").read())
    if trunc:
        blob = blob[:max(4, len(blob) - trunc)]
    for pos, val in flips:
        if len(blob) > 42:
            blob[42 + pos % (len(blob) - 42)] ^= val
    q = os.path.join(d, "c.flac")
    open(q, "wb").write(bytes(blob))
    try:
        r = flac_py.PureFlacReader(q)
        y = r.read(-1)
        assert y.shape[0] <= 16 * 2000   # no runaway output
        r.close()
    except (ValueError, EOFError, OSError, NotImplementedError):
        pass


@settings(max_examples=25, deadline=None)
@given(st.integers(4800, 48000), st.integers(0, 2**31 - 1))
def test_unity_tilt_is_transparent(n, seed):
    """With all four plateau gains at 0 dB the tilt curve is unity, so
    the whole engine (pad, window, rFFT bank, OLA, sum-of-squares
    normalization, crop) must reconstruct the input exactly (float32
    tolerance) at every stream length — the classic COLA identity under
    the reference's exact padding rules."""
    from tomatis_tpu.models.standard import StandardParams, process_array
    rng = np.random.default_rng(seed)
    # keep peaks clear of the 0.999 per-flush clamp: transparency holds
    # only where the reference's write_clamped does not rescale
    x = (rng.standard_normal((n, 2)) * 0.1).clip(-0.9, 0.9).astype(np.float32)
    p = StandardParams(c1_low=0.0, c1_high=0.0, c2_low=0.0, c2_high=0.0,
                       require_48k_stereo=False)
    y, _ = process_array(x, 48000, p, frames_per_chunk=32)
    assert y.shape == x.shape
    # float32 rfft+irfft roundtrip noise is ~-90 dBFS on 0.1 amplitude in
    # the interior. Near the stream edges the sum-of-squares normalizer
    # shrinks: y = x + sum(w*noise)/sum(w^2), so the FFT noise is
    # amplified by ~1/w ≈ 1/sqrt(sum(w^2)) wherever a single frame tail
    # dominates — the reference divides identically (its float64 noise
    # floor just hides it), and depending on where the frame grid lands
    # (n mod hop) sum(w^2) at the last sample can be ~1e-10. Bound the
    # error by the same model instead of a flat tail tolerance.
    n_fft, hop = p.n_fft, p.hop
    pad = n_fft // 2
    pad_end = (hop - ((n - n_fft) % hop)) % hop
    w2 = np.hanning(n_fft) ** 2
    w2sum = np.zeros(pad + n + pad_end)
    for start in range(0, pad + n + pad_end - n_fft + 1, hop):
        w2sum[start:start + n_fft] += w2
    tol = 1e-5 + 5e-7 / np.sqrt(np.maximum(w2sum[pad:pad + n], 1e-12))
    np.testing.assert_array_less(np.abs(y - x),
                                 np.broadcast_to(tol[:, None], y.shape))
