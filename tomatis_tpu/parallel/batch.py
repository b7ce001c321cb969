"""Batch processing: B files per device dispatch (BASELINE.json config 5).

One vmapped chunk executable processes a lane per file; every device round
trip carries ALL lanes' audio, amortizing the tunnel's fixed per-transfer
cost that dominates single-file streaming. Lanes are fully independent —
per-file gate carries, OLA tails, flush plans and writers — and a file
whose I/O fails is isolated: its lane is dropped and the rest continue
(SURVEY §5 failure isolation).

Single-chip: lanes ride the vmap batch dimension. Multi-chip: shard the
lane axis over a 1-D mesh ('data') so each device processes its share —
same executable, jax.sharding does the placement.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tomatis_tpu.engine.streaming import (ChunkedStftEngine, StreamRunner,
                                          WIRE_BUCKET, WIRE_PAGE, WIRE_RICE_IN,
                                          stage_encode)
from tomatis_tpu.io import audio
from tomatis_tpu.ops import wire as wire_ops
from tomatis_tpu.utils.rolling import RollingReader
from tomatis_tpu.utils.stateio import StateCsvWriter

# flat-staged device-side input unpack: the host ships ONE tightly
# packed buffer holding every lane's wire stream (4-byte aligned,
# largest lane placed last) + a tiny offset vector; the device gathers
# each lane's bucket-sized window and unpacks. Shipping a padded
# [lanes, bucket] matrix instead costs ~bucket/2 of zeros per lane on
# the link (measured 9.2% of the h2d direction at 4 lanes x 256 KB
# buckets); here the padding is one lane's worth for the whole batch
# (measured 2.7%). Trailing garbage inside a lane's window is ignored
# by the unpack (stream length rides its header).
_FLAT_GRID = 64 * 1024


def _hdr_words(Bp: int) -> int:
    """Control header riding at the FRONT of the flat h2d buffer: Bp lane
    word-offsets, Bp frame counts, Bp active flags. Packing these into
    the one buffer the chunk already ships means each batch chunk costs
    exactly ONE h2d transfer — shipping them as three separate jit
    arguments cost three extra RPC rounds per chunk on the tunneled
    backend (the link is latency-bound; the single-file engine pays one
    upload per chunk and the batch must match it to reach the same
    floor)."""
    return 3 * Bp


def _flat_canonical(n: int, ch: int, Bp: int):
    """Canonical (lane window, flat length) in words for the vmapped
    unpack: the raw escape caps every lane at raw_words, so ONE 12 MB+
    unpack executable per (n, ch, Bp) serves every chunk — before this,
    each distinct grid-rounded flat length (and per-chunk max-lane
    bucket) compiled AND loaded its own; the axon tunnel's executable-
    load path is latency-bound (measured minutes per reload in degraded
    weather). The host ships the tight buffer; a tiny per-size device
    pad zero-extends it to the canonical shape."""
    from tomatis_tpu.engine.streaming import _IN_SLACK_W
    capW = wire_ops.raw_words(n, ch) + _IN_SLACK_W
    # one extra grid unit absorbs the tight buffer's grid rounding even
    # in the pathological all-lanes-raw case
    T = (-(-((_hdr_words(Bp) + Bp * capW) * 4 + _FLAT_GRID)
           // _FLAT_GRID) * _FLAT_GRID) // 4
    return capW, T

# (chunk_fn, padded lane count, device tuple) -> jitted vmapped step. A
# fresh jax.jit wrapper per process_batch call would re-trace and re-load
# the (large) executable every call — the repeat cost dominates on a
# tunneled TPU even with the persistent compile cache.
_VCHUNK_CACHE: dict = {}

# (chunk_fn, Bp) -> the fused wire-path step (input unpack + vmapped
# chunk + output flat-merge in ONE executable). The unfused path issued
# ~3 + n_pages separate jit dispatches per chunk (pad, unpack, chunk,
# flatten, then one _PAGE_ROW per output page); each dispatch is an RPC
# round on the tunneled backend, and the single-file engine pays none of
# them (its chunk executable returns the page rows directly). The fused
# step matches that: one dispatch, page rows as separate outputs.
_VSTEP_CACHE: dict = {}


def _make_vstep(chunk_fn, Bp: int, capW: int, n: int, ch: int):
    """Fused wire-path step for one (chunk_fn, lane count): canonical
    flat input buffer (control header + lane streams, see _hdr_words)
    -> per-lane unpack -> vmapped chunk -> flat-merged output page rows.
    Returns a jitted fn
    (flat, carry, ot, wt, params, gain) ->
    (auxw, page_rows tuple, out_dev, carry, ot, wt)."""
    vmapped = jax.vmap(chunk_fn, in_axes=(0, 0, 0, 0, 0, None, None))
    PW = WIRE_PAGE // 4

    def step(flat, carry, ot, wt, params, gain):
        offs_w = flat[:Bp].astype(jnp.int32)
        nfs = flat[Bp:2 * Bp].astype(jnp.int32)
        act = flat[2 * Bp:3 * Bp].astype(jnp.bool_)
        rows = jax.vmap(
            lambda o: jax.lax.dynamic_slice(flat, (o,), (capW,)))(offs_w)
        sig = jax.vmap(
            lambda r: wire_ops.unpack_device(r, n, ch, WIRE_RICE_IN,
                                             True))(rows)
        auxw, pages, out, carry, ot, wt = vmapped(sig, nfs, carry, ot,
                                                  wt, params, gain)
        flat_out = _flatten_words(auxw, act, pages)
        page_rows = tuple(flat_out[i * PW:(i + 1) * PW]
                          for i in range(flat_out.shape[0] // PW))
        return (auxw, page_rows, out, carry, ot, wt)

    return jax.jit(step)

# main-thread wall time per stage of the most recent process_batch call
# (diagnostic; bench.py reports it alongside the batch metric)
LAST_TIMINGS: dict = {}

# link byte accounting of the most recent wire-transport process_batch
# call: *_used is the sum of the lanes' exact stream lengths, *_shipped
# what actually crossed the link (used + lane padding to the common
# bucket/page geometry). shipped/used quantifies how much of the
# batch-vs-single-file throughput gap is padding rather than software.
LAST_WIRE: dict = {}


class _Lane:
    """Host-side state of one file's stream."""

    def __init__(self, in_path, out_path, runner: StreamRunner,
                 state_csv_path=None):
        from tomatis_tpu.engine.streaming import SinkState
        self.in_path = str(in_path)
        self.out_path = str(out_path)
        self.runner = runner
        self.eng = runner.engine
        self.plan = runner.plan
        self.reader = None
        self.rolling = None
        self.writer = None
        self.csvw = None
        self.state_csv_path = state_csv_path
        self.frame0 = 0
        self.sink = SinkState(self.plan.pad)
        self.failed = None
        self.done = False

    @property
    def n_frames(self):
        return self.plan.n_frames

    def open(self, sr, ch):
        self.sr = sr
        self.reader = audio.AudioFile(self.in_path, "r")
        self.rolling = RollingReader(self.reader.read, ch,
                                     left_pad=self.plan.pad,
                                     base=-self.plan.pad,
                                     block=self.eng.emit_len)
        self.writer = audio.AudioFile(self.out_path, "w", samplerate=sr,
                                      channels=ch, subtype="PCM_24")
        if self.state_csv_path:
            self.csvw = StateCsvWriter(self.state_csv_path, sr,
                                       self.runner.total)

    def fail(self, err):
        self.failed = str(err)
        self.done = True
        for h in (self.reader, self.writer, self.csvw):
            try:
                if h:
                    h.close()
            except Exception:
                pass

    def consume(self, c_frame0, c_nf, payload, aux, out_dev):
        """Route one chunk's already-decoded PCM bytes + aux rows through
        the engine's shared SinkState (one routing implementation)."""
        self.sink.route(self.runner, self.eng, c_frame0, c_nf, payload,
                        aux, out_dev,
                        self.csvw.on_frames if self.csvw else None,
                        self.writer.write_raw)

    def finish(self, out_tail, w_tail):
        if self.n_frames % self.eng.frames_per_chunk == 0 \
                and self.n_frames > 0:
            self.sink.append_tail(self.runner, self.eng, self.n_frames,
                                  out_tail, w_tail)
        self.sink.final_drain(self.runner, self.writer.write_raw)
        self.writer.close()
        self.reader.close()
        if self.csvw:
            self.csvw.close()
        self.done = True

    def stats(self):
        sc = self.sink.states_count
        tf = int(sc[1] + sc[2])
        return dict(in_path=self.in_path, out_path=self.out_path,
                    failed=self.failed, n_frames=self.n_frames,
                    sr=getattr(self, "sr", 0),
                    c1_frames=int(sc[1]), c2_frames=int(sc[2]),
                    c2_ratio=sc[2] / tf if tf else 0.0)


def process_batch(jobs, params=None, frames_per_chunk: int = 1024,
                  state_csv_paths=None, devices=None) -> list:
    """Process a batch of files with one vmapped engine.

    jobs: list of (in_path, out_path). All inputs must share sr/channels
    (a mismatched file fails in isolation). Returns per-file stats dicts.

    devices: None = single device. An int N or an explicit device list
    shards the lane axis over a 1-D ('data') mesh so each chip streams its
    share of the files (BASELINE config 5); the lane count is padded to a
    multiple of the device count with idle lanes.
    """
    from tomatis_tpu.models.standard import StandardParams, build_controller
    p = params or StandardParams()
    jobs = list(jobs)
    B = len(jobs)
    csvs = state_csv_paths or [None] * B
    if len(csvs) != B:
        raise ValueError(f"state_csv_paths has {len(csvs)} entries for "
                         f"{B} jobs (zip would silently drop jobs)")

    mesh_devs = None
    if devices is not None:
        mesh_devs = (list(devices) if not isinstance(devices, int)
                     else jax.devices()[:devices])
        if len(mesh_devs) < 1:
            raise ValueError("empty device list")

    # probe the batch's sr/ch from the first openable file
    sr = ch = None
    metas = []
    for in_path, _ in jobs:
        try:
            m = audio.info(in_path)
            metas.append(m)
            if sr is None:
                sr, ch = m.samplerate, m.channels
        except Exception as e:
            metas.append(e)

    if sr is None:
        # every file failed to open: keep the documented per-file failure
        # isolation — return per-file stats instead of crashing the engine
        return [dict(in_path=str(in_path), out_path=str(out_path),
                     failed=str(m), n_frames=0, sr=0, c1_frames=0,
                     c2_frames=0, c2_ratio=0.0)
                for (in_path, out_path), m in zip(jobs, metas)]

    engine = ChunkedStftEngine(p.n_fft, p.hop, ch, frames_per_chunk)
    controller = build_controller(p, sr)
    # single-device: wire transport (lossless link compression both ways,
    # the same scheme as the streaming engine — the batch is as link-bound
    # as a single file). Sharded lanes keep the simpler pcm24 transport.
    wire = mesh_devs is None
    from tomatis_tpu.engine.streaming import resolve_rice_out
    chunk_fn = engine.make_chunk_fn(
        controller, transport="wire" if wire else "pcm24",
        rice_out=resolve_rice_out() if wire else None)
    ctl_params = controller.params()
    gain_f32 = jnp.float32(10.0 ** (p.output_gain_db / 20.0))
    # lanes share parameters; only the data axes are batched
    Bp = B  # padded lane count (idle rows make the axis shardable)
    if mesh_devs is not None:
        D = len(mesh_devs)
        Bp = -(-B // D) * D
    vkey = (chunk_fn, Bp, tuple(d.id for d in mesh_devs)
            if mesh_devs is not None else None)
    vchunk = _VCHUNK_CACHE.get(vkey)
    if vchunk is None:
        vmapped = jax.vmap(chunk_fn, in_axes=(0, 0, 0, 0, 0, None, None))
        if mesh_devs is not None:
            # shard_map (not bare GSPMD sharding): every device runs the
            # plain single-chip program on its block of lanes — no
            # partitioned FFT (which XLA:CPU also can't lay out), no
            # cross-device collectives
            from jax import shard_map
            from jax.sharding import Mesh, PartitionSpec
            mesh = Mesh(np.array(mesh_devs), ("data",))
            dp = PartitionSpec("data")
            rp = PartitionSpec()
            vchunk = jax.jit(shard_map(
                vmapped, mesh=mesh,
                in_specs=(dp, dp, dp, dp, dp, rp, rp),
                out_specs=dp, check_vma=False))
        else:
            vchunk = jax.jit(vmapped)
        _VCHUNK_CACHE[vkey] = vchunk

    lanes = []
    for (in_path, out_path), m, csvp in zip(jobs, metas, csvs):
        runner = StreamRunner(engine, controller,
                              total=m.frames if not isinstance(m, Exception)
                              else 0,
                              output_gain_db=p.output_gain_db,
                              transport="pcm24", build_chunk_fn=False)
        lane = _Lane(in_path, out_path, runner, csvp)
        if isinstance(m, Exception):
            lane.fail(m)
        elif p.require_48k_stereo and (m.samplerate != 48000
                                       or m.channels != 2):
            lane.fail(f"expected 48kHz stereo, got {m.samplerate}/"
                      f"{m.channels}")
        elif m.samplerate != sr or m.channels != ch:
            lane.fail(f"batch sr/ch mismatch: {m.samplerate}/{m.channels}")
        else:
            try:
                lane.open(sr, ch)
            except Exception as e:
                lane.fail(e)
        lanes.append(lane)

    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(max_workers=min(8, max(1, B)))

    # long batches: spawn the decode-RPC worker now (non-blocking) so
    # _consume_wire_host's per-lane decodes escape consumer-thread
    # starvation; short batches (tests, dryruns) keep local decode
    if wire and any(not ln.failed
                    and ln.runner.plan.n_frames > 8 * engine.frames_per_chunk
                    for ln in lanes):
        from tomatis_tpu.engine import staging as _staging
        _staging.ensure_rpc_worker()

    carries = [controller.init_carry() for _ in range(Bp)]
    tails = [engine.zero_tails() for _ in range(Bp)]

    def stack_carry(cs):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cs)

    carry_b = stack_carry(carries)
    out_tail_b = jnp.stack([t[0] for t in tails])
    w_tail_b = jnp.stack([t[1] for t in tails])

    import time as _time
    timings = {"stage_s": 0.0, "dispatch_s": 0.0, "block_s": 0.0,
               "consume_s": 0.0, "finish_s": 0.0, "chunks": 0}
    wire_acct = {"in_used": 0, "in_shipped": 0,
                 "out_used": 0, "out_shipped": 0}

    # Three-thread driver, same shape as engine/streaming.py: a producer
    # thread owns the input side (file reads + C++ wire encode + flat
    # pack, one chunk of lookahead), the main thread does ALL jax
    # dispatch and the link waits, and an ordered worker runs the host
    # half (wire decode, CSV rows, flush-cut drain, file writes) —
    # overlapping the next chunk's transfers. Before this split the
    # stage and consume halves serialized with the link on the main
    # thread and the batch ran at ~1/3 of its own transfer floor.
    from tomatis_tpu.utils.pipeline import (OrderedWorker, Prefetcher,
                                            StagedPipeline)

    # idle-lane filler: an all-zeros window's wire stream, identical for
    # every chunk — encoded once per batch instead of per (chunk, idle
    # lane). Zeros pack to header+desc only, so idle lanes cost ~0.4% of
    # an active lane's bytes on the link.
    _zero_stream: list = []

    def zero_stream():
        if not _zero_stream:
            _zero_stream.append(stage_encode(
                np.zeros((engine.chunk_input_len, ch), np.float32),
                False))
        return _zero_stream[0]

    def produce():
        """Producer thread: stage chunk inputs one ahead of dispatch.

        Owns the readers/rolling buffers and its own frame cursors (the
        main thread's lane.frame0 tracks dispatch, which runs one chunk
        behind). Per-lane read errors ride the yielded item and are
        failed on the main thread. A lane failed on the consume side is
        skipped from the next chunk on; at most one already-staged chunk
        of it crosses the link as dead weight, never routed.

        The wire path stages per-lane windows only (dict, no [Bp, L, ch]
        stack): at 16 lanes x 1024-frame chunks the stacked f32 matrix
        is ~270 MB of memset+copy per chunk, measured ~1 s/chunk of
        staging wall that the link wait did not hide. The f32-fallback
        matrix is built only when some lane's chunk can't take the
        codec."""
        pf0 = [0] * Bp
        while True:
            wins = {}
            nfs = np.zeros(Bp, np.int32)
            errs = {}
            for i, lane in enumerate(lanes):
                if lane.done or lane.failed:
                    continue
                nf = min(engine.frames_per_chunk, lane.n_frames - pf0[i])
                if nf <= 0:
                    continue
                try:
                    wins[i] = lane.rolling.window(
                        -lane.plan.pad + pf0[i] * engine.hop,
                        engine.chunk_input_len)
                    pf0[i] += nf
                    lane.rolling.advance(
                        -lane.plan.pad + pf0[i] * engine.hop)
                except Exception as e:
                    # racing lane.fail() may close the reader mid-window;
                    # surface whatever was raised and let the main thread
                    # fail the lane (fail() is idempotent)
                    errs[i] = e
                    continue
                nfs[i] = nf
            if not wins and not errs:
                return
            item = None
            if wire and wins:
                # wire-compress each lane's input on host; one vmapped
                # unpack restores all lanes on device. Any non-PCM_24-
                # exact lane (float sources) falls the whole chunk back
                # to raw floats. The C++ encode releases the GIL — lanes
                # encode in parallel.
                from tomatis_tpu.engine import staging as _staging
                if _staging.rpc_available():
                    # long batches: lane encodes ride the RPC worker
                    # process (the producer thread can be starved by
                    # the main thread's link waits, like the consumer)
                    enc = {i: _staging.host_encode_offload(
                        wins[i], False, WIRE_RICE_IN) for i in wins}
                else:
                    enc = dict(zip(wins, pool.map(
                        lambda i: stage_encode(wins[i], False), wins)))
                items = [enc.get(i) or zero_stream()
                         for i in range(Bp)]
                if all(k == "wire" for k, _ in items):
                    lens = [len(v) for _, v in items]
                    # pack tightly, 4-byte aligned, largest lane last:
                    # every lane's window-sized device slice must stay
                    # in bounds after the device-side pad to the
                    # canonical shape, so the flat tail pad is one
                    # window minus the LAST lane's length — smallest
                    # when that lane is the largest. Lane data starts
                    # after the control header (offs/nfs/act words);
                    # the producer fills offs+nfs here, the main thread
                    # patches act at dispatch time (it may fail a lane
                    # after staging) — all in the ONE shipped buffer.
                    HW = _hdr_words(Bp)
                    order = sorted(range(Bp), key=lambda i: lens[i])
                    offs = np.zeros(Bp, np.int64)
                    pos = HW * 4
                    for j in order:
                        offs[j] = pos
                        pos += -(-lens[j] // 4) * 4
                    flat_len = -(-pos // _FLAT_GRID) * _FLAT_GRID
                    flat = np.zeros(flat_len // 4, np.uint32)
                    flat[:Bp] = (offs // 4).astype(np.uint32)
                    flat[Bp:2 * Bp] = nfs.astype(np.uint32)
                    fbytes = flat.view(np.uint8)
                    for i, (_, v) in enumerate(items):
                        fbytes[offs[i]:offs[i] + lens[i]] = v
                    item = ("wire", flat, sum(lens), flat_len)
            if item is None:
                # f32 fallback: only now pay the stacked matrix
                sigs = np.zeros((Bp, engine.chunk_input_len, ch),
                                np.float32)
                for i, w in wins.items():
                    sigs[i] = w
                item = ("f32", sigs, 0, 0)
            yield item, nfs, errs

    def pipe_start(ck):
        f0s, nfs_c, act_c, packed_c, _ = ck["ready"]
        started = _fetch_start(lanes, nfs_c, act_c, packed_c, engine,
                               wire)
        if started is not None:
            _, used, (pgs, _, _) = started
            wire_acct["out_used"] += sum(used.values())
            wire_acct["out_shipped"] += sum(
                4 * int(r.shape[-1]) for r in pgs)
        return started

    def pipe_finish(ck):
        """S3, main thread: materialize the already-issued transfers and
        row-slice out_dev (jax dispatch stays here); the decode + route
        half runs on the ordered worker."""
        f0s, nfs_c, act_c, packed_c, out_dev_c = ck["ready"]
        if wire:
            started = ck["started"]
            if started is None:
                started = pipe_start(ck)
            rows, _used, (pgs, offs_w, used_w) = started
            flat_np = (np.concatenate([np.asarray(r) for r in pgs])
                       if pgs else np.zeros(0, np.uint32))
            od = {i: out_dev_c[i] for i in rows}

            def job():
                _consume_wire_host(lanes, f0s, nfs_c, rows, flat_np,
                                   (offs_w, used_w), od, engine, pool)
        else:
            packed_np = np.asarray(packed_c)
            od = {i: out_dev_c[i] for i in range(len(lanes))
                  if not lanes[i].failed and int(nfs_c[i]) > 0}

            def job():
                _consume_pcm24_host(lanes, f0s, nfs_c, packed_np, od,
                                    engine)
        worker.submit(job)

    worker = OrderedWorker()
    prefetch = Prefetcher(produce())
    pipe = StagedPipeline(pipe_start, pipe_finish)

    import os as _os
    detail = [] if _os.environ.get("TOMATIS_TIMING_DETAIL") else None
    try:
        while True:
            _t = _time.perf_counter()
            try:
                item, nfs, errs = prefetch.get()
            except StopIteration:
                break
            for i, e in errs.items():
                lanes[i].fail(e)
            kind, payload, in_used, in_shipped = item
            if not nfs.any():
                continue
            if all(lane.done or lane.failed for lane in lanes):
                break   # nothing left to route; drop the staged chunk
            # dispatch-time active mask: decides BOTH the device-side
            # flat compaction and the host's matching slice layout (a
            # lane failing after this point still ships its bytes as
            # dead weight once, never routed)
            act = np.array([bool(nfs[i]) and not (i < len(lanes)
                                                  and lanes[i].failed)
                            for i in range(Bp)])
            if kind == "wire":
                flat = payload
                # dispatch-time active mask rides the header words of the
                # one shipped buffer (the producer staged offs+nfs; a lane
                # can fail between staging and dispatch, so act is patched
                # here) — no separate control-array transfers
                flat[2 * Bp:3 * Bp] = act.astype(np.uint32)
                wire_acct["in_used"] += in_used
                wire_acct["in_shipped"] += in_shipped
                # zero-extend the tight flat buffer ON DEVICE to the
                # canonical length so one fused executable per
                # (chunk_fn, Bp) serves every chunk (pads are tiny)
                from tomatis_tpu.engine.streaming import _PAD_TO
                capW, T = _flat_canonical(engine.chunk_input_len, ch, Bp)
                fdev = flat if flat.shape[0] >= T else _PAD_TO(flat, T)
                vstep = _VSTEP_CACHE.get((chunk_fn, Bp))
                if vstep is None:
                    vstep = _VSTEP_CACHE[(chunk_fn, Bp)] = _make_vstep(
                        chunk_fn, Bp, capW, engine.chunk_input_len, ch)
                timings["stage_s"] += _time.perf_counter() - _t
                _t = _time.perf_counter()
                auxw, page_rows, out_dev, carry_b, out_tail_b, w_tail_b \
                    = vstep(fdev, carry_b, out_tail_b,
                            w_tail_b, ctl_params, gain_f32)
                packed = (auxw, page_rows)
                wait_arr = auxw
            else:
                # raw float fallback ONLY when the codec couldn't take the
                # chunk: materializing this 60+ MB device array wastes ~2 s
                # of link time per chunk if done unconditionally
                sig_arg = jnp.asarray(payload)
                timings["stage_s"] += _time.perf_counter() - _t
                _t = _time.perf_counter()
                res = vchunk(sig_arg, jnp.asarray(nfs), carry_b,
                             out_tail_b, w_tail_b, ctl_params, gain_f32)
                if wire:
                    auxw, pages, out_dev, carry_b, out_tail_b, w_tail_b \
                        = res
                    flat2d = _flatten_out(auxw, jnp.asarray(act), *pages)
                    packed = (auxw, flat2d)
                    wait_arr = auxw
                else:
                    packed, out_dev, carry_b, out_tail_b, w_tail_b = res
                    wait_arr = packed
            timings["dispatch_s"] += _time.perf_counter() - _t
            timings["chunks"] += 1
            frame0s = [ln.frame0 for ln in lanes]
            for i, lane in enumerate(lanes):
                if not (lane.done or lane.failed) and nfs[i] > 0:
                    lane.frame0 += int(nfs[i])
            pipe.push((frame0s, nfs, act, packed, out_dev), wait_arr)

            _t = _time.perf_counter()
            pipe.promote()
            blk = _time.perf_counter() - _t
            timings["block_s"] += blk
            _t = _time.perf_counter()
            ret = 0.0
            if pipe.retire():
                ret = _time.perf_counter() - _t
                timings["consume_s"] += ret
            if detail is not None:
                detail.append({"block": round(blk, 4),
                               "retire": round(ret, 4)})
        _t = _time.perf_counter()
        pipe.drain()
        worker.check(join=True)
        drain_s = _time.perf_counter() - _t
        timings["consume_s"] += drain_s

        _t = _time.perf_counter()
        out_tail_np = np.asarray(out_tail_b)
        w_tail_np = np.asarray(w_tail_b)
        for i, lane in enumerate(lanes):
            if lane.failed or lane.done:
                continue
            try:
                lane.finish(out_tail_np[i], w_tail_np[i])
            except Exception as e:
                lane.fail(e)
        timings["finish_s"] += _time.perf_counter() - _t
        LAST_TIMINGS.clear()
        LAST_TIMINGS.update({k: round(v, 4) if isinstance(v, float) else v
                             for k, v in timings.items()})
        LAST_TIMINGS["drain_s"] = round(drain_s, 4)
        if detail is not None:
            # per-chunk main-thread wall (link wait + retire): the
            # bench's batch floor-gap attribution — a uniform slowdown
            # vs the floor's chunks is software/weather drift, a heavy
            # drain is the un-overlapped pipeline tail
            LAST_TIMINGS["chunk_detail"] = detail
        LAST_WIRE.clear()
        LAST_WIRE.update(wire_acct)
    finally:
        prefetch.close()
        worker.close()
        pool.shutdown(wait=False)
        # an exception escaping the dispatch loop must not leave lane
        # sinks open (WAV headers are patched and FLAC streams finalized
        # on close); normal exits have already finished every lane
        for lane in lanes:
            if not lane.done:
                lane.fail("batch run aborted")
    return [lane.stats() for lane in lanes]


# device-side row extraction: flat page matrix [NP, PW] -> page p's [PW]
# words. One executable for any page index (p is a traced argument).
_PAGE_ROW = jax.jit(
    lambda pg, p: jax.lax.dynamic_index_in_dim(pg, p, 0, keepdims=False))


def _flatten_words(auxw, active, pages):
    """Compact every active lane's used output words into ONE tightly
    packed stream (the d2h mirror of the flat-staged h2d input): lane
    offsets are the exclusive cumsum of the used-word counts that ride
    each lane's aux tail, so the host ships ceil(total_used/PAGE) pages
    per chunk instead of per-lane page sequences — sum of per-lane
    ceil(used_i/PAGE) pages plus a fetch RPC per (lane, page). Measured
    r03: the per-lane pattern put the batch's own zero-compute floor at
    42.8-56.1x vs the single-file path's 69.4x. Lane i's full-capacity
    row is written at offset_i in INCREASING lane order, so each row's
    garbage tail is overwritten by the next lane's write; garbage past
    the total is never fetched. Returns the flat stream [Bp*capW]
    (uint32, a whole number of pages)."""
    words = jnp.concatenate(pages, axis=1)               # [Bp, capW]
    Bp, capW = words.shape
    used = (auxw[:, -2].astype(jnp.int32) * 4096
            + auxw[:, -1].astype(jnp.int32))
    used = jnp.clip(jnp.where(active, used, 0), 0, capW)
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(used)[:-1]])
    flat = jnp.zeros(Bp * capW, words.dtype)
    for i in range(Bp):   # static unroll over lanes (Bp <= ~16)
        flat = jax.lax.dynamic_update_slice(flat, words[i], (offs[i],))
    return flat


@jax.jit
def _flatten_out(auxw, active, *pages):
    """Standalone [NP, PW] flat-merge — only the raw-f32-input fallback
    path uses it (the wire path's merge is fused into _make_vstep)."""
    PW = WIRE_PAGE // 4
    flat = _flatten_words(auxw, active, pages)
    return flat.reshape(flat.shape[0] // PW, PW)


def _lane_layout(aux_np, active, capW):
    """Host replica of _flatten_out's offset arithmetic (identical
    masking/clipping, so host slice boundaries match the device layout
    bit for bit): per-lane used words and exclusive-cumsum offsets."""
    used = (aux_np[:, -2].astype(np.int64) * 4096
            + aux_np[:, -1].astype(np.int64))
    used = np.clip(np.where(active, used, 0), 0, capW)
    offs = np.concatenate([[0], np.cumsum(used)[:-1]]).astype(np.int64)
    return used, offs


def _fetch_start(lanes, nfs, active, packed, eng, wire):
    """Begin the batch readback: read the (small, already-copied) aux
    block, then issue the async page fetches of the flat-merged output
    stream — ceil(total_used/PAGE) fetches per chunk, the last page
    trimmed to its 64 KB bucket. Every fetch object is one ~1 MB row
    (the measured sweet spot on the tunneled link; a whole [NP, PW]
    group is one much larger RPC, which transfers measurably slower)."""
    if not wire:
        return None
    from tomatis_tpu.engine.streaming import trim_tail_page
    auxw, flat = packed
    aux_np = np.asarray(auxw)
    PW = WIRE_PAGE // 4
    Bp = aux_np.shape[0]
    # fused wire path hands page rows as a tuple of [PW] device arrays
    # (outputs of ONE executable — no per-page dispatch); the raw-f32
    # fallback hands one [NP, PW] matrix that needs _PAGE_ROW slicing
    fused = isinstance(flat, tuple)
    capW = (len(flat) if fused else flat.shape[0]) * PW // Bp
    used_w, offs_w = _lane_layout(aux_np, active, capW)
    used = {}
    rows = {}
    for i, lane in enumerate(lanes):
        if lane.failed or not active[i]:
            continue
        try:
            rows[i], _ = eng.unpack_wire_aux(aux_np[i])
            used[i] = int(used_w[i]) * 4
        except Exception as e:
            # a malformed aux block fails ITS lane, not the whole batch —
            # same per-lane isolation as the decode/consume paths below
            lane.fail(e)
    total_w = int(used_w.sum())
    n_p = -(-total_w // PW)
    pgs = (list(flat[:n_p]) if fused
           else [_PAGE_ROW(flat, p) for p in range(n_p)])
    if pgs:
        pgs[-1] = trim_tail_page(pgs[-1], total_w - (n_p - 1) * PW)
    for r in pgs:
        try:
            r.copy_to_host_async()
        except AttributeError:
            pass
    return rows, used, (pgs, offs_w, used_w)


def _consume_pcm24_host(lanes, frame0s, nfs, packed_np, od, eng):
    """Worker-thread half of the pcm24 readback: unpack the (already
    materialized) payload matrix and route each lane's chunk. od maps
    lane index -> its pre-sliced out_dev row (sliced on the main thread;
    only the rare clamped-flush path ever reads it)."""
    for i, lane in enumerate(lanes):
        if i not in od or lane.failed:
            continue
        try:
            payload, aux = eng.unpack_pcm24(packed_np[i])
            lane.consume(frame0s[i], int(nfs[i]), payload, aux, od[i])
        except Exception as e:
            lane.fail(e)


def _consume_wire_host(lanes, frame0s, nfs, rows, flat_np, layout, od,
                       eng, pool=None):
    """Worker-thread half of the wire readback: slice each lane's byte
    range out of the materialized flat stream (offsets replicate the
    device compaction's arithmetic) and decode — in parallel when a
    pool is given (the C++ decode releases the GIL) — then route each
    lane's chunk."""
    from tomatis_tpu.engine import staging as _staging
    from tomatis_tpu.io import wirecodec
    offs_w, used_w = layout
    fbytes = flat_np.view(np.uint8)
    # long batches route the decode through the RPC worker process
    # (process_batch spawns it): the consumer thread can be starved by
    # the main thread's link waits on the tunneled dev host
    dec = (_staging.decode_pcm24_offload if _staging.rpc_available()
           else wirecodec.decode_pcm24)

    def decode_one(i):
        lo = int(offs_w[i]) * 4
        return dec(fbytes[lo:lo + int(used_w[i]) * 4],
                   eng.emit_full, eng.channels)

    futs = {i: pool.submit(decode_one, i) for i in rows} if pool else None
    for i, lane in enumerate(lanes):
        if i not in rows or lane.failed:
            continue
        try:
            payload = futs[i].result() if futs else decode_one(i)
            lane.consume(frame0s[i], int(nfs[i]), payload, rows[i],
                         od[i])
        except Exception as e:
            lane.fail(e)
