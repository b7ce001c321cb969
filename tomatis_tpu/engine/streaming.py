"""Chunked streaming STFT+OLA executor — the framework's single engine.

The reference re-implements one streaming loop in five scripts
(src/process_tomatis.py:265-453 canonical; also process_tomatis_xfade.py,
layer2_apply_eq.py, layer2b_apply_residual_eq(_safe).py). Here it exists
once, TPU-first:

- A *fixed-shape* chunk of ``frames_per_chunk`` frames is processed by one
  jitted function (levels -> controller (gate/gain) -> batched rFFT bank ->
  K-way overlap-add). Fixed shapes mean the executable compiles once and is
  reused for every chunk of every file.
- Sequential state crosses chunk boundaries as a tiny carry:
  (controller carry, OLA sample tail, OLA window-sum tail) — exactly the
  state the reference keeps implicitly in its ring buffers
  (in_buf/out_buf/w_buf, src/process_tomatis.py:308-316).
- The host driver replicates the reference's absolute-coordinate write-out:
  half-window start pad, computed end pad (src/process_tomatis.py:270-272),
  flush every >=5 s of safe samples with *per-flush* peak clamping to 0.999
  (src/process_tomatis.py:331-357,419-426) — flush boundaries affect the
  audible output (each flushed chunk is rescaled independently), so they are
  reproduced bit-for-bit via an explicit flush plan.

Controllers (the only part that differs between processors) produce per-frame
linear gain rows from per-frame levels plus a carried state; see
tomatis_tpu.models for the standard / crossfade / EQ controllers.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from tomatis_tpu.engine import staging
from tomatis_tpu.ops import stft
from tomatis_tpu.ops import wire as wire_ops
from tomatis_tpu.ops.dsp import EPS, PEAK_LIMIT, frame_levels_dbfs
from tomatis_tpu.utils.rolling import RollingReader

FLUSH_THRESHOLD = 48000 * 5  # hard-coded in the reference (src/process_tomatis.py:420)

# wire transport: device->host page size (bytes) and host->device input
# bucket granularity (bytes). Pages let the host fetch exactly
# ceil(used/PAGE) fixed-shape arrays of a variable-size packed stream;
# buckets bound the number of input-unpack executable shapes. 1 MB pages
# measured ~15% faster than 256 KB on the tunneled link (fewer fetch
# round trips) at ~4% average over-fetch on multi-MB chunk streams.
WIRE_PAGE = 1024 * 1024
WIRE_BUCKET = 256 * 1024

# Engine-wide static rice switches for the wire transport, one per link
# DIRECTION (the TWC3 per-block rice mode is a stream property; encoder
# and decoder of each direction pair by construction, and the host
# decoders accept either stream). Rice saves ~4% of link bytes on
# program material (an invertible code must still pay the sign bit),
# so it is worth exactly what its DEVICE half costs:
# - input (host C++ encode -> device unpack): OFF. The device-side
#   unary-region decode measured ~150 ms per 2 M-sample chunk — an
#   order of magnitude more than the link time the bytes buy back.
# - output (device pack -> host C++ decode): per measured link. The
#   device-side rice ENCODE costs real device time per chunk
#   (~37 ms per 2 M-sample chunk measured on a v5e: 597x resident
#   with rice off vs 397x with it on), and this backend SERIALIZES
#   device compute with link transfers — the steady chunk wall time
#   is link_seconds + device_seconds, not max() of them. Measured:
#   101.7x headline = 136.5x zero-compute floor + 109 ms/chunk
#   device, which is the rice-on device time almost exactly. Under
#   a serial link, rice-out pays only when the bytes it saves cost
#   MORE link time than the encode costs device time:
#   bw < saved_bytes / encode_seconds (~0.27 MB / 37 ms ~= 8 MB/s) —
#   i.e. only in deep-outage weather. On a fast local link
#   (PCIe-attached host) rice is a pure slowdown regardless.
#   resolve_rice_out() picks per measured d2h bandwidth; the
#   TOMATIS_WIRE_RICE_OUT env var forces 0/1; bench.py A/Bs both
#   modes under paired floors each round (rice_ab).
WIRE_RICE_IN = False
WIRE_RICE_OUT = False

# d2h bandwidth below which rice-out pays. The first model assumed
# compute hides behind transfers (threshold ~64 MB/s); the measured
# run-vs-floor gap equals the device time, so the link is SERIAL and
# the breakeven is where the ~4% byte saving (~0.27 MB/chunk) buys
# back the ~37 ms/chunk device encode: ~8 MB/s.
RICE_OUT_BW_THRESHOLD_MBPS = 8.0

_RICE_OUT_MEMO: dict = {}

# nf -> device int32 scalar, shared across runs/engines (the frame count
# of a full chunk repeats every chunk; see the dispatch loop)
_nf_scalars: dict = {}


def nf_scalar(nf: int):
    """Memoized device int32 scalar: jnp.int32(nf) builds a fresh device
    array per call — one h2d RPC per chunk on the tunneled backend for a
    value that is frames_per_chunk on every full chunk (only ramp and
    tail chunks differ). Every chunked dispatch loop uses this."""
    nf = int(nf)
    dev = _nf_scalars.get(nf)
    if dev is None:
        dev = _nf_scalars[nf] = jnp.int32(nf)
    return dev


def probe_d2h_mbps(mb: float = 4.0, fresh: bool = False) -> float:
    """One-shot device->host bandwidth estimate (memoized per process):
    time the host materialization of a device-generated array. Costs one
    small compile (persistent-cached) + `mb` MB of link. `fresh=True`
    bypasses and refreshes the memo (the tunneled link's weather changes
    minute to minute; bench.py re-probes while waiting out an outage)."""
    if not fresh and "bw" in _RICE_OUT_MEMO:
        return _RICE_OUT_MEMO["bw"]
    import time
    n = int(mb * 1e6 / 4)
    gen = jax.jit(lambda s: jnp.arange(n, dtype=jnp.float32) + s)
    np.asarray(gen(jnp.float32(0))[:8])    # compile + device warm
    a = gen(jnp.float32(1))
    a.block_until_ready()
    t0 = time.perf_counter()
    h = np.asarray(a)
    bw = h.nbytes / 1e6 / max(time.perf_counter() - t0, 1e-9)
    _RICE_OUT_MEMO["bw"] = bw
    return bw


def resolve_rice_out() -> bool:
    """Engine-wide rice-out policy: env force (TOMATIS_WIRE_RICE_OUT=0/1)
    or, by default, one memoized d2h bandwidth probe against
    RICE_OUT_BW_THRESHOLD_MBPS — slow (tunneled) links get the ~4% byte
    saving, fast (PCIe-local) links keep the device cycles."""
    import os
    env = os.environ.get("TOMATIS_WIRE_RICE_OUT", "auto")
    if env in ("0", "1"):
        return env == "1"
    if "choice" not in _RICE_OUT_MEMO:
        try:
            _RICE_OUT_MEMO["choice"] = (probe_d2h_mbps()
                                        < RICE_OUT_BW_THRESHOLD_MBPS)
        except Exception:
            # no device / probe failure: keep the conservative default
            _RICE_OUT_MEMO["choice"] = WIRE_RICE_OUT
    return _RICE_OUT_MEMO["choice"]

# Shared input-unpack executable; jit caches one trace per (bucket, n, ch).
_UNPACK_INPUT = jax.jit(wire_ops.unpack_device, static_argnums=(1, 2, 3, 4))

# Input staging ships uint32 words with one wide-gather window of tail
# slack (8 * _WMAX words), so the device unpack skips both the
# byte->word bitcast relayout and the whole-buffer zero-pad copy.
_IN_SLACK_W = 8 * wire_ops._WMAX

# Tail-page trimming: the final output page of a chunk is mostly unused
# (avg half a page wasted per chunk at 1 MB pages ≈ 7% of the d2h
# direction). A tiny jitted device-side slice to a 64 KB-bucketed length
# bounds the executable count at 16 shapes per page geometry.
_TAIL_BUCKET_W = 64 * 1024 // 4

_TAIL_SLICE = jax.jit(lambda p, k: p[..., :k * _TAIL_BUCKET_W],
                      static_argnums=1)


def trim_tail_page(pg, used_words_in_page: int):
    """Device-slice a page to ceil(used/64KB) so the fetch skips the
    unused remainder. Falls back to the full page for non-sliceable
    (already-host) arrays."""
    k = -(-used_words_in_page // _TAIL_BUCKET_W)
    if k * _TAIL_BUCKET_W >= pg.shape[-1]:
        return pg
    try:
        return _TAIL_SLICE(pg, k)
    except Exception:
        return pg


# Device-side pad of a bucketed input buffer to the canonical per-(n,ch)
# unpack shape. The pad executables are tiny (~10 KB) and one exists per
# bucket count, but the 12 MB unpack executable exists ONCE per (n, ch):
# before this, every distinct bucketed stream length compiled AND loaded
# its own 12 MB unpack — 8 variants (~100 MB) in a 960-s run, and the
# axon tunnel's executable-load path is latency-bound (minutes of warmup
# with a fully hit compile cache).
_PAD_TO = jax.jit(
    lambda pb, W: jnp.concatenate(
        [pb, jnp.zeros(W - pb.shape[0], jnp.uint32)]) if W > pb.shape[0]
    else pb,
    static_argnums=1)


def _bucketed_unpack(packed: np.ndarray, n: int, ch: int):
    """Pad a packed buffer to the bucket grid (bounding the number of
    tiny device-pad executable shapes), ship it, zero-extend ON DEVICE to
    the canonical max_words(n, ch) shape, and dispatch the one on-device
    unpack executable for this (n, ch) (uint32 + padded_tail fast path)."""
    bucket = -(-len(packed) // WIRE_BUCKET) * WIRE_BUCKET
    pb = np.zeros(bucket // 4 + _IN_SLACK_W, np.uint32)
    pb.view(np.uint8)[:len(packed)] = packed
    # canonical shape: the raw escape guarantees every encoded stream
    # fits in raw_words (the encoder picks min(packed variants, raw)),
    # so raw_words + slack covers any stream the decoder can receive
    W = wire_ops.raw_words(n, ch) + _IN_SLACK_W
    if pb.shape[0] >= W:   # already at/above the cap: dispatch as-is
        return _UNPACK_INPUT(pb, n, ch, WIRE_RICE_IN, True)
    return _UNPACK_INPUT(_PAD_TO(pb, W), n, ch, WIRE_RICE_IN, True)


def ramp_disabled() -> bool:
    """True when TOMATIS_NO_RAMP disables the chunk ramp-up schedule
    (single chunk shape per stream). Processors put this flag in their
    checkpoint fingerprints: the schedule decides chunk boundaries and
    therefore the output's float summation order, so a checkpoint taken
    under one setting must not resume under the other."""
    return bool(os.environ.get("TOMATIS_NO_RAMP"))


def resolve_transport(transport: str, supports_raw: bool):
    """Resolve a user-facing transport choice against the sink.

    transport: "auto" | "wire" | "pcm24" | "f32". Returns
    (resolved transport, byte_payload) where byte_payload says the sink
    receives raw PCM_24 bytes (write_raw) rather than float samples.
    "auto" picks wire on a raw-capable sink, f32 otherwise; explicitly
    requesting a byte transport on a sink that cannot take raw PCM_24
    is an error, not a silent downgrade."""
    if transport not in ("auto", "wire", "pcm24", "f32"):
        raise ValueError(f"unknown transport {transport!r}")
    if transport == "auto":
        transport = "wire" if supports_raw else "f32"
    elif transport in ("wire", "pcm24") and not supports_raw:
        raise ValueError(f"transport {transport!r} requires a sink that "
                         "accepts raw PCM_24 bytes")
    return transport, transport in ("wire", "pcm24")


def stage_encode(sig: np.ndarray, int_in: bool, wire_input: bool = True):
    """Host half of input staging (safe on a producer thread — file-read
    products + C++ wire encode only, NO JAX calls): wire-compress the
    chunk when it is PCM_24-exact. Int24 sources stay integer end to
    end; float sources that are not PCM_24-exact ship raw. Returns a
    tagged item for stage_to_device."""
    if not wire_input:
        return ("raw", sig)
    from tomatis_tpu.engine.staging import host_encode
    return host_encode(sig, int_in, WIRE_RICE_IN)


def stage_to_device(item, n: int, ch: int, stats: dict | None = None):
    """Device half of input staging (call from the dispatching thread —
    keeps every JAX dispatch on one thread): bucketed on-device unpack
    of wire items, bit-identical to shipping the floats; raw chunks pass
    through (transfer implicit in the chunk_fn call). stats, when given,
    accumulates in_bytes / in_raw_chunks."""
    kind, val = item
    if kind == "wire":
        if stats is not None:
            stats["in_bytes"] += len(val)
        return _bucketed_unpack(val, n, ch)
    if kind == "raw_inexact" and stats is not None:
        stats["in_raw_chunks"] += 1
    return val


# ---------------------------------------------------------------------------
# Flush plan: where the reference's streaming write-out cuts its chunks.
# ---------------------------------------------------------------------------

@dataclass
class FlushPlan:
    """Write-out chunk boundaries in absolute sample coordinates.

    ``cuts`` are (abs_start, length) pairs covering [-pad, end) contiguously.
    Peak clamping is applied per cut after clipping to [0, total) — matching
    write_clamped + the >=5 s flush rule of src/process_tomatis.py:331-357.
    """
    cuts: list
    pad: int
    pad_end: int
    n_frames: int
    total: int


def flush_plan(total: int, n_fft: int, hop: int,
               threshold: int = FLUSH_THRESHOLD) -> FlushPlan:
    if (n_fft // 2) % hop:
        # frames start at -n_fft//2; if hop does not divide the pad, the
        # reference's pad_end formula leaves the stream tail uncovered
        # and the cropped output silently loses its final samples
        raise ValueError(
            "n_fft//2 must be a multiple of hop for the cropped streaming "
            "write-out (the adaptive processor accepts any hop)")
    pad = n_fft // 2
    pad_end = stft.pad_end(total, n_fft, hop)
    n_frames = (pad + total + pad_end - n_fft) // hop + 1
    if n_frames <= 0:
        # empty stream: no frames, no cuts (the end-coverage append below
        # would otherwise emit a spurious cut for the bare pad region)
        return FlushPlan([], pad, pad_end, 0, total)
    cuts = []
    out_base = -pad
    for j in range(n_frames):
        next_start = -pad + (j + 1) * hop
        safe = next_start - out_base - n_fft
        if safe >= threshold:
            cuts.append((out_base, safe))
            out_base += safe
    end = -pad + (n_frames - 1) * hop + n_fft
    if end > out_base:
        cuts.append((out_base, end - out_base))
    return FlushPlan(cuts, pad, pad_end, n_frames, total)


# ---------------------------------------------------------------------------
# The jitted chunk executable.
# ---------------------------------------------------------------------------

# (engine shapes, transport, norm, controller static key) -> jitted chunk fn;
# parameters are traced arguments, so reruns and new files never recompile.
_CHUNK_FN_CACHE: dict = {}


class ChunkedStftEngine:
    """Compiles and runs the per-chunk pipeline for one (n_fft, hop, C, F_c)."""

    def __init__(self, n_fft: int, hop: int, channels: int = 2,
                 frames_per_chunk: int = 1024, window: np.ndarray | None = None):
        if n_fft % hop:
            raise ValueError("n_fft must be a multiple of hop")
        self.n_fft = n_fft
        self.hop = hop
        self.channels = channels
        self.frames_per_chunk = frames_per_chunk
        self.window = (stft.hann_symmetric(n_fft) if window is None
                       else np.asarray(window, np.float32))
        self.tail_len = n_fft - hop
        self.chunk_input_len = (frames_per_chunk - 1) * hop + n_fft
        self.emit_len = frames_per_chunk * hop
        self.emit_full = self.emit_len + self.tail_len
        self.aux_width = frames_per_chunk + n_fft // hop - 1
        self.log_keys: tuple = ()

    def zero_tails(self):
        return (jnp.zeros((self.tail_len, self.channels), jnp.float32),
                jnp.zeros((self.tail_len,), jnp.float32))

    def unpack_f32(self, packed: np.ndarray):
        """Split a materialized f32-transport array into (emit [S, C],
        aux rows [R, W])."""
        L = self.emit_full * self.channels
        emit = packed[:L].reshape(self.emit_full, self.channels)
        R = 1 + len(self.log_keys)
        aux = packed[L:L + R * self.aux_width].reshape(R, self.aux_width)
        return emit, aux

    def unpack_pcm24(self, packed: np.ndarray):
        """Split a materialized pcm24-transport array into (pcm bytes
        [S*C*3], aux rows [R, W]) — last aux row is block peaks."""
        nb = self.emit_full * self.channels * 3
        pcm = packed[:nb]
        R = 2 + len(self.log_keys)
        aux = packed[nb:nb + R * self.aux_width * 4].copy().view(
            np.float32).reshape(R, self.aux_width)
        return pcm, aux

    def fetch_wire_start(self, auxw_dev, pages):
        """Read the (small, already transferred) aux array and issue the
        async fetches of only the pages the packed stream used (the last
        page device-trimmed to its used 64 KB bucket) — call this as
        early as possible so the transfer rides the link while the host
        does other work; materialize with np.asarray on the returned
        pages, then wirecodec.decode_pcm24."""
        aux_np = np.asarray(auxw_dev)
        rows, used_bytes = self.unpack_wire_aux(aux_np)
        n_p = -(-used_bytes // WIRE_PAGE)
        pgs = list(pages[:n_p])
        if pgs:
            tail_words = -(-used_bytes // 4) - (n_p - 1) * (WIRE_PAGE // 4)
            pgs[-1] = trim_tail_page(pgs[-1], tail_words)
        for pg in pgs:
            try:
                pg.copy_to_host_async()
            except AttributeError:
                pass
        return rows, used_bytes, pgs

    def unpack_wire_aux(self, aux: np.ndarray):
        """Split the wire-transport aux array into (rows [R, W], used
        stream bytes). Rows as in pcm24 (levels, logs..., peaks); the
        used-words count rides the final two f32 slots as exact integer
        halves (hi * 4096 + lo)."""
        R = 2 + len(self.log_keys)
        rows = aux[:R * self.aux_width].reshape(R, self.aux_width)
        base = R * self.aux_width
        used_words = int(aux[base]) * 4096 + int(aux[base + 1])
        return rows, used_words * 4

    def make_chunk_fn(self, controller, transport: str = "f32",
                      output_gain_db: float = 0.0,
                      norm: str = "eps",
                      rice_out: bool | None = None) -> Callable:
        """Build (or fetch from cache) the jitted chunk step.

        controller must provide:
            LOG_KEYS, static_key(), params() -> pytree of traced arrays,
            init_carry() -> pytree,
            step(levels [F], valid [F] bool, carry, params) ->
                (gains [F, bins] float32 linear, log dict of [F] arrays, carry')

        All numeric parameters (gain curves, thresholds, output gain) are
        TRACED ARGUMENTS of the compiled function, so one executable is
        shared by every run with the same static configuration — no
        per-invocation retrace/recompile (~2 s saved per call).

        transport="f32":
            fn(sig [L, C], n_valid, ctl_carry, out_tail, w_tail, params,
               gain_lin) ->
                (packed, carries) where packed is ONE flat float32 array:
                normalized emit [(F_c*hop + tail) * C] followed by the aux
                rows (unpack with engine.unpack_f32). gain_lin is ignored
                (the f32 path applies output gain on host, like the
                reference's write_clamped).
        transport="pcm24":
            ... -> (packed, out_f32_deviceref, carries) where packed is ONE
            flat uint8 array: little-endian 24-bit PCM of
            clip(round((emit*gain_lin) * 2^23)) followed by the aux rows'
            float32 bytes (unpack with engine.unpack_pcm24). Quantizing
            on-device shrinks device->host traffic by 1/4 — the dominant
            cost on a tunneled TPU — and the bytes are exactly the PCM_24
            file payload, so the host write is a memcpy.
        transport="wire":
            ... -> (aux, pages, out_f32_deviceref, carries): the PCM_24
            ints are losslessly compressed on-device (ops.wire: best fixed
            predictor + mid/side + per-block bit packing) into
            fixed-shape uint32 page arrays; the host
            reads `aux` first (rows + used length, one small transfer),
            fetches only ceil(used/WIRE_PAGE) pages, and decodes with the
            native codec (io.wirecodec) into the same PCM_24 payload the
            pcm24 transport ships raw. Typically 1.5-2.2 B/sample on the
            link instead of 3 — the realtime factor is link-bound.

        Aux rows [R, W] (W = F + n_fft/hop - 1): row 0 levels, one row per
        controller.LOG_KEYS entry, and (pcm24 only) a final row of
        per-hop-block max |emit*gain| peaks. Everything rides a single
        transfer because each device->host round trip costs ~0.2 s of
        latency over the tunnel.

        output_gain_db is accepted for call-site convenience but the value
        actually used at run time is the gain_lin argument.

        rice_out: wire-transport output rice mode for THIS executable
        (None = the module default WIRE_RICE_OUT; callers wanting the
        measured-link policy pass resolve_rice_out()). The host decoder
        reads the mode per block, so executables of either mode feed the
        same sinks.
        """
        if transport not in ("f32", "pcm24", "wire"):
            raise ValueError(transport)
        rice = WIRE_RICE_OUT if rice_out is None else bool(rice_out)
        if norm not in ("eps", "floor8"):
            # "eps": y/(w + 1e-12), the streaming processors' convention
            # (src/process_tomatis.py:421); "floor8": y/max(w, 1e-8), the
            # adaptive processor's (src/process_tomatis_adaptive.py:330) —
            # they differ visibly on window-edge samples at stream bounds.
            raise ValueError(norm)
        log_keys = tuple(getattr(controller, "LOG_KEYS", ()))
        if getattr(self, "_log_keys_bound", False) \
                and self.log_keys != log_keys:
            # the aux unpack layout (unpack_pcm24 / unpack_wire_aux)
            # follows self.log_keys; rebinding one engine to controllers
            # with different log rows would silently misalign it — fail
            # loudly, one engine per controller type
            raise ValueError(
                f"engine already bound to LOG_KEYS {self.log_keys}; "
                f"controller wants {log_keys} — use a separate "
                "ChunkedStftEngine per controller type")
        self._log_keys_bound = True
        self.log_keys = log_keys
        self.transport = transport
        key = (self.n_fft, self.hop, self.channels, self.frames_per_chunk,
               hash(self.window.tobytes()), transport, norm, rice,
               type(controller).__name__, controller.static_key())
        cached = _CHUNK_FN_CACHE.get(key)
        if cached is not None:
            return cached

        n_fft, hop, F = self.n_fft, self.hop, self.frames_per_chunk
        win = jnp.asarray(self.window)
        win2 = win * win
        tail = self.tail_len

        @jax.jit
        def chunk_fn(sig, n_valid, ctl_carry, out_tail, w_tail, params,
                     gain_lin):
            frames = stft.frame_signal(sig, n_fft, hop, F)      # [F, C, n_fft]
            levels = frame_levels_dbfs(
                jnp.transpose(frames, (0, 2, 1)))               # [F]
            valid = jnp.arange(F) < n_valid
            gains, log, ctl_carry_new = controller.step(levels, valid,
                                                        ctl_carry, params)
            y = stft.apply_gain_bank(frames, win, gains)        # [F, C, n_fft]
            mask = valid.astype(jnp.float32)
            y = y * mask[:, None, None]
            ola = stft.overlap_add(y, hop)                      # [F*hop + tail, C]
            w = stft.overlap_add(
                (win2[None, None, :] * mask[:, None, None]), hop)[:, 0]
            ola = ola.at[:tail].add(out_tail)
            w = w.at[:tail].add(w_tail)
            # Normalize the whole span. For a full chunk the host uses only
            # the first F*hop samples (the tail region still awaits the next
            # chunk's frames, carried raw below); for the stream's final,
            # possibly partial chunk the tail region is already complete and
            # correctly normalized here.
            if norm == "floor8":
                emit = ola / jnp.maximum(w[:, None], 1e-8)
            else:
                emit = ola / (w[:, None] + EPS)
            W = F + n_fft // hop - 1
            rows = [levels] + [log[k] for k in log_keys]
            rows = [jnp.pad(r.astype(jnp.float32), (0, W - F)) for r in rows]
            # freeze all carried state when the chunk holds no valid
            # frames: batch lanes keep dispatching after their stream is
            # exhausted, and an all-invalid chunk must not wipe the OLA
            # tail (the lane's final flush still needs it) or advance the
            # controller
            keep = n_valid > 0
            ctl_kept = jax.tree_util.tree_map(
                lambda new_leaf, old_leaf: jnp.where(keep, new_leaf,
                                                     old_leaf),
                ctl_carry_new, ctl_carry)
            carries = (ctl_kept,
                       jnp.where(keep, ola[F * hop:], out_tail),
                       jnp.where(keep, w[F * hop:], w_tail))
            if transport == "f32":
                # Fuse payload + aux into ONE flat f32 array: each extra
                # device->host transfer costs ~0.2 s of tunnel latency.
                packed = jnp.concatenate(
                    [emit.reshape(-1)] + [r for r in rows])
                return (packed,) + carries
            out = emit * gain_lin
            peaks = jnp.max(jnp.abs(out.reshape(-1, hop, out.shape[1])),
                            axis=(1, 2))
            aux = jnp.stack(rows + [peaks])
            v = jnp.clip(jnp.round(out * 8388608.0),
                         -8388608, 8388607).astype(jnp.int32)
            if transport == "wire":
                words, used = wire_ops.pack_device(
                    v, v.shape[0], v.shape[1], rice=rice)
                PW = WIRE_PAGE // 4
                n_pages = -(-(words.size * 4) // WIRE_PAGE)
                wpad = jnp.pad(words, (0, n_pages * PW - words.size))
                pages = tuple(wpad[i * PW:(i + 1) * PW]
                              for i in range(n_pages))
                # used_words rides the f32 aux array as two small integer
                # halves (each < 2^20, exactly representable). A plain
                # cast is only exact below 2^24 words; a bitcast would
                # produce a denormal f32 that the TPU flushes to zero.
                used_hi = (used >> 12).astype(jnp.float32)
                used_lo = (used & 0xFFF).astype(jnp.float32)
                auxw = jnp.concatenate(
                    [aux.reshape(-1), used_hi[None], used_lo[None]])
                return (auxw, pages, out) + carries
            pcm = jnp.stack([v & 255, (v >> 8) & 255, (v >> 16) & 255],
                            axis=-1).astype(jnp.uint8).reshape(-1)
            packed = jnp.concatenate(
                [pcm, jax.lax.bitcast_convert_type(
                    aux, jnp.uint8).reshape(-1)])
            # `out` is returned as an (untransferred) device array: the rare
            # clamped flush needs pre-quantization floats — ints saturate at
            # full scale, so a needed clamp can't be recovered from bytes.
            return (packed, out) + carries

        _CHUNK_FN_CACHE[key] = chunk_fn
        return chunk_fn


# ---------------------------------------------------------------------------
# Host-side stream driver.
# ---------------------------------------------------------------------------

def _read_fn(source, int_in: bool):
    """read(n) callable over an AudioFile reader or an ndarray."""
    if isinstance(source, np.ndarray):
        x = source if source.ndim == 2 else source[:, None]
        cur = [0]

        def read(n):
            blk = x[cur[0]:cur[0] + n]
            cur[0] += len(blk)
            return blk
        return read
    return source.read_int24 if int_in else source.read


class StreamRunner:
    """Runs a controller over an audio stream with reference write semantics.

    Emits per-frame log rows (for state CSVs) and clamped output chunks. The
    caller supplies sinks:
        on_frames(frame_idx0, starts, log)   per engine chunk (host arrays)
        on_audio(chunk [n, C])               clamped output in file order
    """

    def __init__(self, engine: ChunkedStftEngine, controller,
                 total: int, output_gain_db: float = 0.0,
                 peak_mode: str = "per_flush", transport: str = "f32",
                 build_chunk_fn: bool = True, wire_input: bool = True,
                 wire_rice_out: bool | None = None):
        """transport="pcm24" quantizes + packs PCM_24 bytes on-device (4x
        less device->host traffic; the host write becomes a memcpy). The
        per-flush clamp decision then uses device-computed per-hop-block
        peaks; the (rare) clamped flush decodes the ints, rescales and
        re-encodes on host — a <=1 LSB deviation from the f32 path.
        transport="wire" additionally compresses the PCM_24 ints
        losslessly on-device (see make_chunk_fn).

        wire_input: compress the host->device input with the wire codec
        (native C++ encode, on-device XLA unpack) whenever the input chunk
        is exactly PCM_24-representable — bit-identical to the float32
        transfer it replaces, at ~half the bytes. Chunks that are not
        PCM_24-exact (float sources) fall back to float32 transparently.

        wire_rice_out: wire-transport output rice mode; None picks per
        the measured link (resolve_rice_out)."""
        self.engine = engine
        self.controller = controller
        self.total = int(total)
        self.output_gain = float(10.0 ** (output_gain_db / 20.0)) \
            if output_gain_db else 1.0
        self.plan = flush_plan(total, engine.n_fft, engine.hop)
        if peak_mode not in ("per_flush", "none"):
            raise ValueError(peak_mode)
        self.peak_mode = peak_mode
        self.transport = transport
        if wire_rice_out is None and transport == "wire" and build_chunk_fn:
            wire_rice_out = resolve_rice_out()
        self.wire_rice_out = wire_rice_out
        self.chunk_fn = engine.make_chunk_fn(controller, transport=transport,
                                             rice_out=wire_rice_out) \
            if build_chunk_fn else None
        # Ramp-up: the pipeline's fill transient is paid at chunk
        # granularity — the first dispatch cannot overlap anything, so a
        # full-size first chunk serializes ~3 chunk-times of link before
        # steady state. Starting the stream with two smaller chunks
        # (F/4, F/2) fills the pipeline ~4x faster, shrinking the fixed
        # per-run transient (which dominates short runs). Only for
        # streams long enough to have a steady state; the extra
        # executables are shape-cached like the primary.
        F_c = engine.frames_per_chunk
        self._by_F = {F_c: (engine, self.chunk_fn)}
        # TOMATIS_NO_RAMP: single-chunk-shape streams. The ramp's two
        # extra executables each cost a compile-or-load over the axon
        # tunnel (minutes in degraded weather) while saving only ~1 s of
        # fill transient per run — a throughput harness that runs many
        # streams per process wants one executable per shape family.
        # The flag rides the checkpoint fingerprint (ramp_disabled() in
        # the processors' config dicts): chunk boundaries decide float
        # summation order, so a resume must replay the same schedule.
        self._ramp = bool(build_chunk_fn and self.plan.n_frames > 2 * F_c
                          and F_c % 4 == 0 and F_c // 4 >= 64
                          and not ramp_disabled())
        if self._ramp:
            for f in (F_c // 4, F_c // 2):
                e = ChunkedStftEngine(engine.n_fft, engine.hop,
                                      engine.channels, f,
                                      window=engine.window)
                self._by_F[f] = (e, e.make_chunk_fn(
                    controller, transport=transport,
                    rice_out=self.wire_rice_out))
        self.ctl_params = controller.params()
        self.gain_f32 = jnp.float32(self.output_gain)
        self.stats = {}
        self.audio_samples_written = 0
        self.wire_input = wire_input
        self.wire_stats = {"in_bytes": 0, "out_bytes": 0,
                           "in_raw_chunks": 0}

    def _chunk_F(self, frame0: int) -> int:
        """Frame count of the chunk starting at absolute frame `frame0` —
        a PURE function of frame0, so a run resumed from a checkpoint
        reproduces the exact chunk boundaries (and therefore the exact
        float summation order and output bytes) of an uninterrupted
        run."""
        F_c = self.engine.frames_per_chunk
        if not self._ramp:
            return F_c
        if frame0 == 0:
            return F_c // 4
        if frame0 == F_c // 4:
            return F_c // 2
        return F_c

    def run(self, source, on_audio: Callable | None = None,
            on_frames: Callable | None = None, ckpt=None,
            resume_state: dict | None = None,
            on_progress: Callable | None = None) -> dict:
        """ckpt: optional engine.checkpoint.CheckpointManager — persists the
        stream state every N chunks. resume_state: a state dict previously
        returned by ckpt.load(); the caller must position its sinks at
        resume_state meta['scalars'] offsets (audio_samples_written,
        frames_consumed) before calling.

        The sinks (on_audio, on_frames, on_progress) are invoked in
        stream order but from a background worker thread — keep them
        thread-compatible (file/CSV writers are; thread-affine GUI or
        signal work is not). A sink exception fails the run."""
        eng, plan = self.engine, self.plan
        n_fft, hop, F_c = eng.n_fft, eng.hop, eng.frames_per_chunk
        C = eng.channels
        pad, pad_end, n_frames = plan.pad, plan.pad_end, plan.n_frames

        if self.total <= 0 or n_frames <= 0:
            # degenerate empty stream: nothing to emit, empty stats
            self.stats = dict(n_frames=0, c1_frames=0, c2_frames=0,
                              c1_ratio=0.0, c2_ratio=0.0, timings={})
            return self.stats

        ctl_carry = self.controller.init_carry()
        out_tail, w_tail = eng.zero_tails()
        wire = self.transport == "wire"
        pcm24 = self.transport in ("pcm24", "wire")  # byte-payload modes
        bps = C * 3  # bytes per sample frame in pcm24 transport

        frame0 = 0         # absolute index of next chunk's first frame
        # Normalized output collector in absolute coords starting at -pad.
        sink = SinkState(pad)
        self.audio_samples_written = 0

        if resume_state is not None:
            sc = resume_state["__meta__"]["scalars"]
            frame0 = int(sc["frame0"])
            sink.out_base = int(sc["out_base"])
            sink.cut_i = int(sc["cut_i"])
            self.audio_samples_written = int(sc["audio_samples_written"])
            sink.states_count = resume_state["states_count"].copy()
            leaves = [jnp.asarray(resume_state[f"carry{i}"])
                      for i in range(int(sc["n_carry_leaves"]))]
            treedef = jax.tree_util.tree_structure(ctl_carry)
            ctl_carry = jax.tree_util.tree_unflatten(treedef, leaves)
            out_tail = jnp.asarray(resume_state["out_tail"])
            w_tail = jnp.asarray(resume_state["w_tail"])
            if resume_state["out_pend"].size:
                sink.out_pend = [resume_state["out_pend"]]
            if resume_state["peak_pend"].size:
                sink.peak_pend = [resume_state["peak_pend"]]
            fr = resume_state.get("ref_floats")
            if fr is not None and fr.size:
                sink.float_refs = [(sink.out_base, len(fr), fr)]

        # Float-free input: when the source reads losslessly as PCM_24
        # ints and the wire codec ships the input, keep the whole host
        # input path integer (no float conversion, no exactness check).
        int_in = (self.wire_input and not isinstance(source, np.ndarray)
                  and getattr(source, "int24_readable", False))
        in_dt = np.int32 if int_in else np.float32

        # Rolling input in absolute sample coords (stream starts at -pad).
        in_base = -pad + frame0 * hop
        if in_base > 0:
            if isinstance(source, np.ndarray):
                source = source[in_base:]
            else:
                source.seek(in_base)
        reader = RollingReader(_read_fn(source, int_in), C, dtype=in_dt,
                               left_pad=max(0, -in_base), base=in_base,
                               block=eng.emit_len)

        log_keys = self.engine.log_keys

        def consume_start(ready):
            """Begin materializing a chunk: read the (already transferred)
            aux array and issue the async page fetches, so the device->host
            stream transfer overlaps the next chunk's host-side input
            assembly instead of serializing after it."""
            if not wire:
                return None
            _, _, c_packed, _, c_eng = ready
            return c_eng.fetch_wire_start(c_packed[0], c_packed[1])

        def consume_materialize(ready, started=None):
            """Main thread: wait out the device->host transfers and return
            the raw buffer(s) for the host half. All DISPATCH of jax
            work stays on this thread; the bulk transfers are waited out
            here too. (The consumer thread may still READ device arrays
            on the rare clamped-flush path — consume_host keeps the
            pre-quantization float refs, and a triggered clamp calls
            np.asarray on them from the worker; that read takes the
            slower second-thread transfer path, an accepted cost for a
            path that almost never runs.)"""
            if wire:
                if started is None:
                    started = consume_start(ready)
                rows, used_bytes, pgs = started
                buf = np.concatenate([np.asarray(pg) for pg in pgs])
                return rows, used_bytes, buf
            return np.asarray(ready[2])

        def consume_host(ready, mat):
            """Consumer-thread half: decode the payload (C++ wire decode
            releases the GIL) and route it via the shared SinkState."""
            c_frame0, c_nf, _c_packed, c_out_dev, c_eng = ready
            if wire:
                from tomatis_tpu.io import wirecodec
                aux, used_bytes, buf = mat
                # decode_offload (set at prefetch selection, before the
                # first consume runs): route the decode through the RPC
                # worker process on long streams
                payload = (staging.decode_pcm24_offload
                           if decode_offload else wirecodec.decode_pcm24)(
                    buf.view(np.uint8), c_eng.emit_full, C)
                self.wire_stats["out_bytes"] += used_bytes
            elif pcm24:
                payload, aux = c_eng.unpack_pcm24(mat)
            else:
                payload, aux = c_eng.unpack_f32(mat)
            sink.route(self, c_eng, c_frame0, c_nf, payload, aux,
                       c_out_dev, on_frames, on_audio, pcm24)

        def capture_snapshot(next_frame0, carry, ot, wt):
            """Pre-dispatch state for chunk `next_frame0` (host copies)."""
            leaves, _ = jax.tree_util.tree_flatten(carry)
            return dict(frame0=next_frame0,
                        leaves=[np.asarray(l) for l in leaves],
                        out_tail=np.asarray(ot), w_tail=np.asarray(wt))

        def save_checkpoint(snap):
            out_pend = sink.out_pend
            buf = (np.concatenate(out_pend) if len(out_pend) != 1
                   else out_pend[0]) if out_pend else np.zeros(
                0, np.uint8 if pcm24 else np.float32)
            pk = (np.concatenate(sink.peak_pend) if len(sink.peak_pend) != 1
                  else sink.peak_pend[0]) if sink.peak_pend \
                else np.zeros(0, np.float32)
            unit = bps if pcm24 else 1
            n_pend = len(buf) // unit
            refs = self._gather_floats(sink.float_refs, sink.out_base,
                                       sink.out_base + n_pend, C) \
                if pcm24 and n_pend else np.zeros((0, C), np.float32)
            state = {f"carry{i}": l for i, l in enumerate(snap["leaves"])}
            state.update(out_tail=snap["out_tail"], w_tail=snap["w_tail"],
                         out_pend=buf, peak_pend=pk, ref_floats=refs,
                         states_count=sink.states_count)
            state["__scalars__"] = dict(
                frame0=int(snap["frame0"]), out_base=int(sink.out_base),
                cut_i=int(sink.cut_i), n_carry_leaves=len(snap["leaves"]),
                audio_samples_written=int(self.audio_samples_written),
                frames_consumed=int(snap["frame0"]))
            ckpt.maybe_save(state, force=True)

        # Input prefetch thread: the file read + C++ wire encode of chunk
        # k+1 runs concurrently with chunk k's link transfers (the encode
        # releases the GIL inside the C call; ~0.1 s per chunk that would
        # otherwise serialize with the link). One chunk of lookahead;
        # exceptions surface on the main thread at the next get.
        # Output worker thread: once the main thread has waited out a
        # chunk's link transfer, the host-only half (wire decode, CSV
        # rows, flush-cut drain, file write) runs here, overlapping the
        # next chunk's transfers — note on_frames/on_audio/on_progress
        # therefore run on the worker thread. Jobs run strictly in
        # order; the checkpoint and final-flush paths join the queue
        # first, so everything they read is fully drained. (Worker
        # first: a failed Prefetcher start then leaks only an idle
        # daemon, not a spinning producer holding the input file.)
        from tomatis_tpu.utils.pipeline import (OrderedWorker, Prefetcher,
                                                StagedPipeline)

        def produce(f0):
            # chunk sizes must track the main loop exactly; _chunk_F is a
            # pure function of the frame cursor, so both sides agree
            while f0 < n_frames:
                e_i = self._by_F[self._chunk_F(f0)][0]
                sig = reader.window(-pad + f0 * hop, e_i.chunk_input_len)
                item = stage_encode(sig, int_in, self.wire_input)
                f0 += min(e_i.frames_per_chunk, n_frames - f0)
                if f0 < n_frames:
                    reader.advance(-pad + f0 * hop)
                yield item, e_i

        writer = OrderedWorker()
        # Input staging: a separate PROCESS when the source is a wire-
        # encodable file (see engine/staging.py — the dev host's link
        # waits do not reliably yield to Python threads, so the thread
        # producer's read+encode serialized with the link); the thread
        # producer remains for arrays, raw transports and as the
        # TOMATIS_PROCESS_STAGE=0 fallback.
        src_path = getattr(source, "path", None)
        prefetch = None
        # >= 8 chunks: the worker's one-time ~2 s spawn must amortize
        # (it persists across runs in one parent process, so long-stream
        # sessions pay it once); short CLI runs keep the thread producer
        if (self.wire_input and src_path
                and not isinstance(source, np.ndarray)
                and n_frames - frame0 > 8 * F_c
                and staging.process_staging_enabled()):
            sched = []
            e_list = []
            f0s = frame0
            while f0s < n_frames:
                e_s = self._by_F[self._chunk_F(f0s)][0]
                ws = -pad + f0s * hop
                f0s += min(e_s.frames_per_chunk, n_frames - f0s)
                sched.append((ws, e_s.chunk_input_len,
                              (-pad + f0s * hop) if f0s < n_frames
                              else None))
                e_list.append(e_s)
            try:
                stream = staging.stage_stream(src_path, int_in, C,
                                              in_base, eng.emit_len,
                                              sched, WIRE_RICE_IN)

                class _ProcPrefetch:
                    """Prefetcher-shaped facade over the staging worker
                    (items arrive in chunk order; e_i derives from the
                    locally computed schedule)."""

                    def __init__(self):
                        self._i = 0

                    def get(self):
                        item = stream.get()   # raises StopIteration/err
                        e_i = e_list[self._i]
                        self._i += 1
                        return item, e_i

                    def close(self):
                        stream.close()
                prefetch = _ProcPrefetch()
                # same reasoning on the consume side: the ~50+ ms wire
                # decode per chunk rides a worker process too (spawn
                # overlaps the warmup; local fallback on any trouble)
                staging.ensure_rpc_worker()
                decode_offload = True
            except Exception:
                prefetch = None   # worker spawn failed: thread fallback
        if prefetch is None:
            prefetch = Prefetcher(produce(frame0))
            decode_offload = False

        def next_staged():
            item, e_i = prefetch.get()
            return stage_to_device(item, e_i.chunk_input_len, C,
                                   self.wire_stats)

        # Software pipeline, depth 3: each chunk's device round trip gets a
        # full loop iteration of slack at every sync point, so the main
        # thread only ever waits for transfers that have already had one
        # iteration (~one chunk of link time) to complete. Per iteration k:
        #   dispatch chunk k                (async; input staged last iter)
        #   S1 on chunk k-1: wait compute, start the aux/payload readback
        #   S2 on chunk k-2: read aux, issue the paged stream fetches
        #   stage input k+1                 (h2d rides the link async)
        #   S3 on chunk k-3: materialize pages (long since arrived), hand
        #                    the host half to the ordered writer thread
        # The input transfer stays implicit in the jit/unpack call —
        # explicit jax.device_put takes a much slower RPC path on tunneled
        # TPUs — and the device executes in dispatch order, so chunk k's
        # compute is enqueued before chunk k+1's input unpack.
        import os as _os
        import time as _time
        timings = {"input_host_s": 0.0, "dispatch_compute_s": 0.0,
                   "consume_s": 0.0}
        detail = [] if _os.environ.get("TOMATIS_TIMING_DETAIL") else None
        chunk_i = 0
        staged = None

        def pipe_finish(ck):
            mat = consume_materialize(ck["ready"], ck["started"])

            def job(iv=ck["ready"], m=mat):
                consume_host(iv, m)
                if on_progress is not None:
                    # frames fully processed and written so far
                    on_progress(iv[0] + iv[1], n_frames)
            writer.submit(job)

        pipe = StagedPipeline(lambda ck: consume_start(ck["ready"]),
                              pipe_finish)

        last_full = False
        try:
            while frame0 < n_frames:
                eng_i, fn_i = self._by_F[self._chunk_F(frame0)]
                nf = min(eng_i.frames_per_chunk, n_frames - frame0)
                last_full = nf == eng_i.frames_per_chunk
                take_snap = (ckpt is not None and chunk_i > 0
                             and chunk_i % ckpt.every == 0)
                if take_snap:
                    # checkpoint boundary: everything before this chunk
                    # must be consumed and drained before its state is
                    # captured, so the pipeline stalls here (checkpoints
                    # are many chunks apart)
                    _t = _time.perf_counter()
                    pipe.drain()
                    timings["consume_s"] += _time.perf_counter() - _t
                    writer.check(join=True)
                    save_checkpoint(capture_snapshot(
                        frame0, ctl_carry, out_tail, w_tail))
                chunk_i += 1
                _d = {} if detail is not None else None
                if staged is None:
                    _t = _time.perf_counter()
                    staged = next_staged()
                    timings["input_host_s"] += _time.perf_counter() - _t
                    if _d is not None:
                        _d["stage_first"] = _time.perf_counter() - _t

                _t = _time.perf_counter()
                res = fn_i(
                    staged, nf_scalar(nf), ctl_carry, out_tail,
                    w_tail, self.ctl_params, self.gain_f32)
                timings["dispatch_compute_s"] += _time.perf_counter() - _t
                if _d is not None:
                    _d["dispatch"] = _time.perf_counter() - _t
                if wire:
                    auxw, pages, out_dev, ctl_carry, out_tail, w_tail = res
                    packed = (auxw, pages)
                    wait_arr = auxw
                elif pcm24:
                    packed, out_dev, ctl_carry, out_tail, w_tail = res
                    wait_arr = packed
                else:
                    packed, ctl_carry, out_tail, w_tail = res
                    out_dev = None
                    wait_arr = packed
                pipe.push((frame0, nf, packed, out_dev, eng_i), wait_arr)
                frame0 += nf

                # promote older chunks one pipeline stage each (oldest
                # first, capped at S2 — S3 is the retire step below)
                _t = _time.perf_counter()
                pipe.promote()
                timings["dispatch_compute_s"] += _time.perf_counter() - _t
                if _d is not None:
                    _d["promote"] = _time.perf_counter() - _t

                # stage the next chunk's input while the link drains
                staged = None
                if frame0 < n_frames:
                    _t = _time.perf_counter()
                    staged = next_staged()
                    timings["input_host_s"] += _time.perf_counter() - _t
                    if _d is not None:
                        _d["stage_next"] = _time.perf_counter() - _t

                # retire the chunk whose pages have had a full iteration
                _t = _time.perf_counter()
                if pipe.retire():
                    timings["consume_s"] += _time.perf_counter() - _t
                    if _d is not None:
                        _d["retire"] = _time.perf_counter() - _t

                if detail is not None:
                    detail.append(_d)
            _t = _time.perf_counter()
            pipe.drain()
            timings["consume_s"] += _time.perf_counter() - _t
            writer.check(join=True)
        finally:
            # stop a prefetcher that is still blocked on a full queue (an
            # exception above leaves un-got items) and shut the writer
            # down; harmless after a normal exit where both are idle
            prefetch.close()
            writer.close()
        # Final: if the last chunk was full, its tail is still in the carry.
        # (A checkpoint is always captured before dispatching the chunk at
        # its frame0 < n_frames, so a resumed run re-enters the loop and
        # re-derives last_full.)
        if last_full:
            sink.append_tail(self, eng, n_frames, out_tail, w_tail, pcm24)
        sink.final_drain(self, on_audio)

        sc_ = sink.states_count
        total_f = int(sc_[1] + sc_[2])
        self.stats = dict(
            n_frames=n_frames,
            c1_frames=int(sc_[1]),
            c2_frames=int(sc_[2]),
            c1_ratio=sc_[1] / total_f if total_f else 0.0,
            c2_ratio=sc_[2] / total_f if total_f else 0.0,
            # per-stage MAIN-THREAD wall time: input staging (queue wait +
            # device unpack dispatch), device dispatch+compute wait,
            # readback link wait (decode/drain/write run on the consumer
            # thread and overlap the other stages)
            timings={k: round(v, 4) for k, v in timings.items()},
            wire=dict(self.wire_stats),
        )
        if detail is not None:
            self.stats["chunk_timings"] = [
                {k: round(v, 4) for k, v in d.items()} for d in detail]
        return self.stats

    def _drain(self, out_pend, peak_pend, float_refs, cut_i, out_base,
               final: bool, on_audio):
        """Write out every flush cut whose samples are fully available.
        Mutates the pending lists in place; returns (cut_i, out_base)."""
        plan = self.plan
        pcm24 = self.transport in ("pcm24", "wire")
        unit = self.engine.channels * 3 if pcm24 else 1
        hop = self.engine.hop
        while cut_i < len(plan.cuts):
            start, n = plan.cuts[cut_i]
            avail = sum(len(a) for a in out_pend) // unit
            if not final and avail < (start - out_base) + n:
                break
            buf = np.concatenate(out_pend, 0) if len(out_pend) > 1 \
                else (out_pend[0] if out_pend else
                      np.zeros(0, np.uint8 if pcm24 else np.float32))
            rel = start - out_base
            chunk = buf[rel * unit:(rel + n) * unit]
            if pcm24:
                pk = np.concatenate(peak_pend) if len(peak_pend) != 1 \
                    else peak_pend[0]
                self._write_cut_pcm24(chunk, pk, float_refs, start, n,
                                      out_base, on_audio)
                nblk = (rel + n) // hop  # cut boundaries lie on the lattice
                del peak_pend[:]
                peak_pend.append(pk[nblk:])
                float_refs[:] = [r for r in float_refs
                                 if r[0] + r[1] > start + n]
            else:
                self._write_cut_f32(chunk, start, on_audio)
            del out_pend[:]
            out_pend.append(buf[(rel + n) * unit:])
            out_base = start + n
            cut_i += 1
            if final and cut_i == len(plan.cuts):
                break
        return cut_i, out_base

    def _write_cut_f32(self, chunk: np.ndarray, abs_start: int, on_audio):
        """Reference write_clamped (src/process_tomatis.py:331-357)."""
        s = max(0, abs_start)
        e = min(self.total, abs_start + len(chunk))
        if e <= s or on_audio is None:
            return
        out = chunk[s - abs_start:e - abs_start]
        if self.output_gain != 1.0:
            out = out * self.output_gain
        if self.peak_mode == "per_flush":
            peak = float(np.max(np.abs(out))) if out.size else 0.0
            if peak > PEAK_LIMIT:
                out = out * (PEAK_LIMIT / peak)
        self.audio_samples_written += len(out)
        on_audio(np.asarray(out, np.float32))

    def _write_cut_pcm24(self, chunk_bytes: np.ndarray, peaks: np.ndarray,
                         float_refs, abs_start: int, n: int, out_base: int,
                         on_audio):
        """PCM_24-transport write: bytes pass straight through unless this
        flush cut needs the reference's peak clamp. Block peaks (device-
        computed, pre-quantization) gate the decision conservatively; a
        triggered clamp pulls the pre-quantization floats from the kept
        device refs, rescales exactly and re-encodes on host."""
        C = self.engine.channels
        hop = self.engine.hop
        s = max(0, abs_start)
        e = min(self.total, abs_start + n)
        if e <= s or on_audio is None:
            return
        out = chunk_bytes[(s - abs_start) * C * 3:(e - abs_start) * C * 3]
        peak = 0.0
        if self.peak_mode == "per_flush" and len(peaks):
            b0 = (s - out_base) // hop
            b1 = -(-(e - out_base) // hop)
            window = peaks[b0:b1]
            peak = float(np.max(window)) if len(window) else 0.0
        if peak > PEAK_LIMIT:
            x = self._gather_floats(float_refs, s, e, C)
            true_peak = float(np.max(np.abs(x))) if x.size else 0.0
            if true_peak > PEAK_LIMIT:
                x = x * (PEAK_LIMIT / true_peak)
            out = _encode_pcm24(x)
        self.audio_samples_written += len(out) // (C * 3)
        on_audio(out)

    @staticmethod
    def _gather_floats(float_refs, s: int, e: int, channels: int):
        """Assemble pre-quantization floats for [s, e) from kept refs."""
        out = np.zeros((e - s, channels), np.float32)
        for r_start, r_n, arr in float_refs:
            lo = max(s, r_start)
            hi = min(e, r_start + r_n)
            if hi <= lo:
                continue
            piece = np.asarray(arr)[lo - r_start:hi - r_start]
            out[lo - s:hi - s] = piece
        return out


def _encode_pcm24(x: np.ndarray) -> np.ndarray:
    """float [n, C] -> interleaved little-endian 24-bit bytes [n*C*3]."""
    from tomatis_tpu.utils.pcm import le24_from_i32
    v = np.clip(np.rint(x * 8388608.0), -8388608, 8388607).astype(np.int32)
    return le24_from_i32(v.reshape(-1))


class SinkState:
    """Mutable routing state of one output stream: pending encoded
    pieces, per-hop-block peaks, pre-quantization float refs (the
    clamped-flush path), flush-cut cursor, and C1/C2 counters.

    `route` is the ONE implementation of per-chunk output routing —
    shared by StreamRunner's consumer thread and the batch driver's
    lanes (previously a diverging copy, see parallel/batch.py)."""

    def __init__(self, pad: int):
        self.out_pend: list = []
        self.peak_pend: list = []
        self.float_refs: list = []
        self.out_base = -pad
        self.cut_i = 0
        self.states_count = np.zeros(3, np.int64)

    def route(self, runner, eng, c_frame0, c_nf, payload, aux, out_dev,
              on_frames, write, pcm24: bool = True) -> None:
        """Route one decoded chunk: per-frame log (CSV/callback), pending
        output, flush-cut drain, file write. payload: decoded PCM_24
        bytes (pcm24=True) or float samples. eng: the CHUNK's engine
        (ramp-up streams use several; tail_len/channels are shared)."""
        hop = eng.hop
        pad = runner.plan.pad
        log = {"levels": aux[0, :c_nf]}
        for i, k in enumerate(eng.log_keys):
            log[k] = aux[1 + i, :c_nf]
        if "states" in log:
            log["states"] = log["states"].astype(np.int32)
            self.states_count[1] += int(np.sum(log["states"] == 1))
            self.states_count[2] += int(np.sum(log["states"] == 2))
        if on_frames is not None:
            starts = -pad + (c_frame0 + np.arange(c_nf)) * hop
            on_frames(c_frame0, starts, log)
        if c_nf < eng.frames_per_chunk:
            # Partial (final) chunk: the stream's OLA tail lies at
            # nf*hop, inside the emit region, already normalized.
            emit_n = c_nf * hop + eng.tail_len
        else:
            emit_n = c_nf * hop
        if pcm24:
            self.out_pend.append(payload[:emit_n * eng.channels * 3])
            self.peak_pend.append(aux[-1][:emit_n // hop])
            self.float_refs.append((-pad + c_frame0 * hop, emit_n,
                                    out_dev))
        else:
            self.out_pend.append(payload[:emit_n])
        self.cut_i, self.out_base = runner._drain(
            self.out_pend, self.peak_pend, self.float_refs, self.cut_i,
            self.out_base, False, write)

    def append_tail(self, runner, eng, n_frames: int, out_tail, w_tail,
                    pcm24: bool = True) -> None:
        """After a final FULL chunk the carry still holds the stream's
        OLA tail (past the emit region): normalize, gain, and queue it."""
        tail_np = (np.asarray(out_tail)
                   / (np.asarray(w_tail)[:, None] + EPS))
        if not pcm24:
            self.out_pend.append(tail_np)
            return
        hop, C = eng.hop, eng.channels
        tail_out = tail_np * np.float32(runner.output_gain)
        nblk = eng.tail_len // hop
        if nblk:
            self.peak_pend.append(np.max(np.abs(
                tail_out.reshape(nblk, hop, C)), axis=(1, 2)))
        self.out_pend.append(_encode_pcm24(tail_out))
        self.float_refs.append((-runner.plan.pad + n_frames * hop,
                                eng.tail_len, tail_out))

    def final_drain(self, runner, write) -> None:
        runner._drain(self.out_pend, self.peak_pend, self.float_refs,
                      self.cut_i, self.out_base, True, write)
