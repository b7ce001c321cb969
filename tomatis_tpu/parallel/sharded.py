"""Multi-chip processing: data-parallel over files x sequence-parallel over
frames, on a 2-D `jax.sharding.Mesh` with explicit ICI collectives.

The reference is single-process/single-thread (SURVEY §2.7); the latent
parallelism it leaves on the table is (a) across files and (b) across frames.
This module exploits both with `shard_map`:

- 'data' axis: each device group processes different files of a batch
  (BASELINE.json config 5: 16 hour-long files across cores).
- 'seq' axis: one file's frames are split across devices. Two things cross
  the split and ride ICI:
    1. the gate automaton — solved as a block-composed associative scan:
       each shard composes its local transition tables, shard totals are
       `all_gather`ed (tiny [n_shards, S] int32), every shard composes its
       exclusive prefix locally, then applies its local prefix tables;
    2. the OLA halo — each shard's trailing n_fft-hop samples overlap the
       next shard's head; one `ppermute` shifts the tails right.

Everything else (levels, the rFFT gain bank, windowing) is embarrassingly
frame-parallel and runs unmodified per shard.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tomatis_tpu.ops import gate as gate_ops, stft
from tomatis_tpu.ops.dsp import EPS, frame_levels_dbfs


def make_mesh(n_devices: int | None = None, data: int | None = None,
              devices=None) -> Mesh:
    """Build a ('data', 'seq') mesh over the first n_devices devices."""
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devices)
    if data is None:
        data = 2 if n % 2 == 0 and n > 1 else 1
    seq = n // data
    if data * seq != n:
        raise ValueError(f"cannot factor {n} devices into data={data}")
    return Mesh(np.asarray(devices).reshape(data, seq), ("data", "seq"))


def _sharded_gate_updelay(levels, ton, toff, delay_frames: int, s0, valid):
    """Block-composed variant-A gate inside shard_map (axis 'seq').

    levels/valid: local [F_loc]; s0: global initial carry index (replicated).
    Returns local states [F_loc] and the *global* final carry index.
    """
    D = int(delay_frames)
    tables = gate_ops.updelay_tables(levels, ton, toff, D, valid=valid)
    prefix = jax.lax.associative_scan(gate_ops.compose_tables, tables, axis=0)
    total = prefix[-1]                                    # [S] this shard
    totals = jax.lax.all_gather(total, "seq")             # [n_seq, S]
    idx = jax.lax.axis_index("seq")
    S = D + 2
    ident = jnp.arange(S, dtype=jnp.int32)

    def body(i, acc):
        excl_acc, all_acc = acc
        nxt = gate_ops.compose_tables(excl_acc, totals[i])
        return (jnp.where(i < idx, nxt, excl_acc),
                gate_ops.compose_tables(all_acc, totals[i]))

    # tie the init carry to totals' (possible) vmap batching so the scan
    # carry type stays stable
    ident0 = ident + 0 * totals[0]
    excl, full = jax.lax.fori_loop(0, totals.shape[0], body, (ident0, ident0))
    s0_loc = excl[s0]                                     # carry entering shard
    final = jnp.take_along_axis(
        prefix, jnp.broadcast_to(s0_loc, (prefix.shape[0], 1)), axis=1)[:, 0]
    states = gate_ops.updelay_states_from_index(final, D)
    carry_out = full[s0]          # global final carry, replicated on all shards
    return states, carry_out


def _sharded_gate_minhold(levels, ton, toff, min_hold_frames: int, s0,
                          valid):
    """Block-composed variant-B (min-hold) gate inside shard_map (axis
    'seq'): same scheme as _sharded_gate_updelay over the 2*(H+1)-state
    carry space of ops/gate.py::minhold_tables."""
    H = int(min_hold_frames)
    tables = gate_ops.minhold_tables(levels, ton, toff, H, valid=valid)
    prefix = jax.lax.associative_scan(gate_ops.compose_tables, tables,
                                      axis=0)
    total = prefix[-1]
    totals = jax.lax.all_gather(total, "seq")
    idx = jax.lax.axis_index("seq")
    S = 2 * (H + 1)
    ident = jnp.arange(S, dtype=jnp.int32)

    def body(i, acc):
        excl_acc, all_acc = acc
        nxt = gate_ops.compose_tables(excl_acc, totals[i])
        return (jnp.where(i < idx, nxt, excl_acc),
                gate_ops.compose_tables(all_acc, totals[i]))

    ident0 = ident + 0 * totals[0]
    excl, full = jax.lax.fori_loop(0, totals.shape[0], body,
                                   (ident0, ident0))
    s0_loc = excl[s0]
    final = jnp.take_along_axis(
        prefix, jnp.broadcast_to(s0_loc, (prefix.shape[0], 1)), axis=1)[:, 0]
    states = gate_ops.minhold_states_from_index(final, H)
    return states, full[s0]


def _sharded_alpha_ramp(targets, step, alpha0, valid):
    """Block-composed crossfade ramp inside shard_map (axis 'seq').

    The per-frame update x -> min(hi, max(lo, x+a)) is a clip-affine map
    (ops/gate.py); each shard composes its local maps, the shard totals are
    all_gathered, and every shard applies its exclusive prefix — the same
    scheme as the gate's transition tables, in the (a, lo, hi) algebra.
    Returns (alpha_local [F_loc], global final alpha).
    """
    big = jnp.float32(1e9)
    targets = targets.astype(jnp.float32)
    a = jnp.where(targets > 0.5, step, -step)
    lo = jnp.where(targets > 0.5, -big, 0.0)
    hi = jnp.where(targets > 0.5, 1.0, big)
    a = jnp.where(valid, a, 0.0)
    lo = jnp.where(valid, lo, -big)
    hi = jnp.where(valid, hi, big)

    def compose(f, g):  # f applied first
        a1, b1, c1 = f
        a2, b2, c2 = g
        return (a1 + a2,
                jnp.maximum(b2, b1 + a2),
                jnp.minimum(c2, jnp.maximum(b2, c1 + a2)))

    prefix = jax.lax.associative_scan(compose, (a, lo, hi), axis=0)
    total = (prefix[0][-1], prefix[1][-1], prefix[2][-1])
    totals = jax.tree_util.tree_map(
        lambda t: jax.lax.all_gather(t, "seq"), total)   # each [n_seq]
    idx = jax.lax.axis_index("seq")
    ident = (jnp.float32(0.0) + 0 * totals[0][0],
             -big + 0 * totals[0][0], big + 0 * totals[0][0])

    def body(i, acc):
        excl_acc, all_acc = acc
        t_i = (totals[0][i], totals[1][i], totals[2][i])
        nxt = compose(excl_acc, t_i)
        keep = i < idx
        excl_new = jax.tree_util.tree_map(
            lambda n, o: jnp.where(keep, n, o), nxt, excl_acc)
        return (excl_new, compose(all_acc, t_i))

    (excl, full) = jax.lax.fori_loop(0, totals[0].shape[0], body,
                                     (ident, ident))
    a0 = jnp.float32(alpha0)
    a0_loc = jnp.minimum(excl[2], jnp.maximum(excl[1], a0 + excl[0]))
    alpha = jnp.minimum(prefix[2], jnp.maximum(prefix[1], a0_loc + prefix[0]))
    final = jnp.minimum(full[2], jnp.maximum(full[1], a0 + full[0]))
    return alpha, final


def check_halo_span(n_fft: int, hop: int, frames_per_shard: int) -> None:
    """The OLA halo ppermute moves ONE shard hop, so a frame's overlap
    span (n_fft - hop samples) must fit inside a single shard's emit
    region (frames_per_shard * hop samples). Beyond that, shard i's tail
    would also overlap shard i+2's head and the output would silently
    diverge from the single-device engine. Every sharded step factory
    calls this; raise instead of producing wrong audio."""
    if frames_per_shard * hop < n_fft - hop:
        raise ValueError(
            f"frames_per_shard={frames_per_shard} too small: the OLA "
            f"overlap span is {n_fft - hop} samples but a shard emits "
            f"only {frames_per_shard * hop}; need frames_per_shard >= "
            f"{-(-(n_fft - hop) // hop)} at n_fft={n_fft}, hop={hop}")


def _ola_halo_emit(y, win2, mask, hop: int, F_loc: int, n_seq: int,
                   in_ty=None, in_tw=None, norm: str = "eps"):
    """Shared tail of every sharded per-file step: overlap-add, the
    forward OLA halo ppermute (my trailing n_fft-hop samples overlap the
    next shard's head), optional carried head tails (super-chunk
    streaming), and normalization.

    Returns (emit [F_loc*hop, C], tail_y [tail, C], tail_w [tail]) — the
    tails are the shard's raw trailing accumulations (only the LAST
    shard's are meaningful to a streaming caller)."""
    ola = stft.overlap_add(y, hop)
    w = stft.overlap_add(win2[None, None, :] * mask[:, None, None],
                         hop)[:, 0]
    tail = ola.shape[0] - F_loc * hop
    perm = [(i, i + 1) for i in range(n_seq - 1)]
    recv_y = jax.lax.ppermute(ola[F_loc * hop:], "seq", perm)
    recv_w = jax.lax.ppermute(w[F_loc * hop:], "seq", perm)
    if in_ty is not None:
        first = (jax.lax.axis_index("seq") == 0).astype(jnp.float32)
        recv_y = recv_y + first * in_ty
        recv_w = recv_w + first * in_tw
    ola = ola.at[:tail].add(recv_y)
    w = w.at[:tail].add(recv_w)
    if norm == "floor8":   # the adaptive processor's normalizer floor
        emit = ola[:F_loc * hop] / jnp.maximum(w[:F_loc * hop, None], 1e-8)
    else:
        emit = ola[:F_loc * hop] / (w[:F_loc * hop, None] + EPS)
    return emit, ola[F_loc * hop:], w[F_loc * hop:]


def sharded_xfade_step(mesh: Mesh, n_fft: int, hop: int,
                       frames_per_shard: int, channels: int,
                       ton: float, toff: float, delay_frames: int,
                       alpha_step: float, g1_db, g2_db, window=None):
    """dp x sp step for the CROSSFADE processor: block-scanned gate +
    block-scanned alpha ramp + per-frame dB-domain gain blend + OLA halo.

    fn(frames [B, F, C, n_fft], s0 [B], alpha0 [B], n_valid [B]) ->
        (emit [B, F*hop, C], states [B, F], alpha [B, F],
         gate_carry [B], alpha_carry [B])
    """
    check_halo_span(n_fft, hop, frames_per_shard)
    win = jnp.asarray(window if window is not None
                      else stft.hann_symmetric(n_fft))
    win2 = win * win
    g1_db = jnp.asarray(g1_db, jnp.float32)
    g2_db = jnp.asarray(g2_db, jnp.float32)
    n_seq = mesh.shape["seq"]
    F_loc = frames_per_shard

    def per_file(frames, s0, alpha0, n_valid):
        seq_i = jax.lax.axis_index("seq")
        f0 = seq_i * F_loc
        valid = (f0 + jnp.arange(F_loc)) < n_valid
        levels = frame_levels_dbfs(jnp.transpose(frames, (0, 2, 1)))
        states, gate_carry = _sharded_gate_updelay(
            levels, ton, toff, delay_frames, s0, valid)
        targets = (states == 2).astype(jnp.float32)
        alpha, alpha_carry = _sharded_alpha_ramp(
            targets, jnp.float32(alpha_step), alpha0, valid)
        mixed_db = ((1.0 - alpha)[:, None] * g1_db[None, :]
                    + alpha[:, None] * g2_db[None, :])
        gains = 10.0 ** (mixed_db / 20.0)
        y = stft.apply_gain_bank(frames, win, gains.astype(jnp.float32))
        mask = valid.astype(jnp.float32)
        y = y * mask[:, None, None]
        emit, _, _ = _ola_halo_emit(y, win2, mask, hop, F_loc, n_seq)
        return emit, states, alpha, gate_carry, alpha_carry

    def step(frames, s0, alpha0, n_valid):
        return jax.vmap(per_file)(frames, s0, alpha0, n_valid)

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P("data", "seq", None, None), P("data"), P("data"),
                  P("data")),
        out_specs=(P("data", "seq", None), P("data", "seq"),
                   P("data", "seq"), P("data"), P("data")),
        check_vma=False)

    return jax.jit(sharded)


def sharded_adaptive_step(mesh: Mesh, n_fft: int, hop: int,
                          frames_per_shard: int, channels: int,
                          ton: float, toff: float, min_hold_frames: int,
                          alpha_step: float, g1_db, g2_db, window=None):
    """dp x sp step for the ADAPTIVE processor's streaming pass: min-hold
    gate (block scan) + crossfade alpha ramp (clip-affine block scan) +
    per-frame dB-domain gain blend + OLA halo. Threshold search and
    headroom handling stay host-side exactly as in models/adaptive.py;
    this shards the heavy STFT pass.

    fn(frames [B, F, C, n_fft], s0 [B], alpha0 [B], n_valid [B]) ->
        (emit [B, F*hop, C], states [B, F], alpha [B, F],
         gate_carry [B], alpha_carry [B])
    """
    check_halo_span(n_fft, hop, frames_per_shard)
    win = jnp.asarray(window if window is not None
                      else stft.hann_symmetric(n_fft))
    win2 = win * win
    g1_db = jnp.asarray(g1_db, jnp.float32)
    g2_db = jnp.asarray(g2_db, jnp.float32)
    n_seq = mesh.shape["seq"]
    F_loc = frames_per_shard

    def per_file(frames, s0, alpha0, n_valid):
        seq_i = jax.lax.axis_index("seq")
        f0 = seq_i * F_loc
        valid = (f0 + jnp.arange(F_loc)) < n_valid
        levels = frame_levels_dbfs(jnp.transpose(frames, (0, 2, 1)))
        states, gate_carry = _sharded_gate_minhold(
            levels, ton, toff, min_hold_frames, s0, valid)
        targets = (states == 2).astype(jnp.float32)
        # snap-first (ref adaptive: alpha[0] = target[0]): alpha0 < 0 is
        # the "stream start" sentinel -> snap to the global first target
        t0 = jax.lax.all_gather(targets[0], "seq")[0]
        a0 = jnp.where(alpha0 < 0, t0, alpha0)
        alpha, alpha_carry = _sharded_alpha_ramp(
            targets, jnp.float32(alpha_step), a0, valid)
        mixed_db = ((1.0 - alpha)[:, None] * g1_db[None, :]
                    + alpha[:, None] * g2_db[None, :])
        gains = 10.0 ** (mixed_db / 20.0)
        y = stft.apply_gain_bank(frames, win, gains.astype(jnp.float32))
        mask = valid.astype(jnp.float32)
        y = y * mask[:, None, None]
        # adaptive normalizer floor is max(w, 1e-8) (models/adaptive.py)
        emit, _, _ = _ola_halo_emit(y, win2, mask, hop, F_loc, n_seq,
                                    norm="floor8")
        return emit, states, alpha, gate_carry, alpha_carry

    def step(frames, s0, alpha0, n_valid):
        return jax.vmap(per_file)(frames, s0, alpha0, n_valid)

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P("data", "seq", None, None), P("data"), P("data"),
                  P("data")),
        out_specs=(P("data", "seq", None), P("data", "seq"),
                   P("data", "seq"), P("data"), P("data")),
        check_vma=False)

    return jax.jit(sharded)


def sharded_adaptive_stream_step(mesh: Mesh, n_fft: int, hop: int,
                                 frames_per_shard: int, channels: int,
                                 ton: float, toff: float,
                                 min_hold_frames: int, alpha_step: float,
                                 g1_db, g2_db, window=None):
    """sharded_adaptive_step with OLA tail carry across super-chunks (the
    adaptive variant of the file->file sharded CLI path). Threshold search
    and the headroom/peak-protect passes stay host-side exactly as in
    models/adaptive.py; this shards the streaming STFT pass.

    fn(frames [B, F, C, n_fft], s0 [B], alpha0 [B], n_valid [B],
       in_tail_y [B, tail, C], in_tail_w [B, tail]) ->
        (emit [B, F*hop, C], levels [B, F], states [B, F], alpha [B, F],
         gate_carry [B], alpha_carry [B],
         out_tail_y [B, n_seq*tail, C], out_tail_w [B, n_seq*tail])
    with only the last tail block of out_tail_* meaningful (see
    sharded_stream_step). Stream start: s0 = min_hold_frames (the gate may
    switch on frame 0), alpha0 = -1.0 (snap-first sentinel)."""
    check_halo_span(n_fft, hop, frames_per_shard)
    win = jnp.asarray(window if window is not None
                      else stft.hann_symmetric(n_fft))
    win2 = win * win
    g1_db = jnp.asarray(g1_db, jnp.float32)
    g2_db = jnp.asarray(g2_db, jnp.float32)
    n_seq = mesh.shape["seq"]
    F_loc = frames_per_shard

    def per_file(frames, s0, alpha0, n_valid, in_ty, in_tw):
        seq_i = jax.lax.axis_index("seq")
        f0 = seq_i * F_loc
        valid = (f0 + jnp.arange(F_loc)) < n_valid
        levels = frame_levels_dbfs(jnp.transpose(frames, (0, 2, 1)))
        states, gate_carry = _sharded_gate_minhold(
            levels, ton, toff, min_hold_frames, s0, valid)
        targets = (states == 2).astype(jnp.float32)
        t0 = jax.lax.all_gather(targets[0], "seq")[0]
        a0 = jnp.where(alpha0 < 0, t0, alpha0)
        alpha, alpha_carry = _sharded_alpha_ramp(
            targets, jnp.float32(alpha_step), a0, valid)
        mixed_db = ((1.0 - alpha)[:, None] * g1_db[None, :]
                    + alpha[:, None] * g2_db[None, :])
        gains = 10.0 ** (mixed_db / 20.0)
        y = stft.apply_gain_bank(frames, win, gains.astype(jnp.float32))
        mask = valid.astype(jnp.float32)
        y = y * mask[:, None, None]
        emit, t_y, t_w = _ola_halo_emit(y, win2, mask, hop, F_loc, n_seq,
                                        in_ty, in_tw, norm="floor8")
        return (emit, levels, states, alpha, gate_carry, alpha_carry,
                t_y, t_w)

    def step(frames, s0, alpha0, n_valid, in_ty, in_tw):
        return jax.vmap(per_file)(frames, s0, alpha0, n_valid, in_ty,
                                  in_tw)

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P("data", "seq", None, None), P("data"), P("data"),
                  P("data"), P("data"), P("data")),
        out_specs=(P("data", "seq", None), P("data", "seq"),
                   P("data", "seq"), P("data", "seq"), P("data"),
                   P("data"), P("data", "seq", None), P("data", "seq")),
        check_vma=False)

    return jax.jit(sharded)


def sharded_process_step(mesh: Mesh, n_fft: int, hop: int,
                         frames_per_shard: int, channels: int,
                         ton: float, toff: float, delay_frames: int,
                         g1_lin, g2_lin, window=None):
    """Build the jitted dp x sp processing step.

    Returns fn(frames [B, F, C, n_fft], s0 [B] int32, n_valid [B] int32) ->
        (emit [B, F*hop, C] normalized output, states [B, F], carry [B])
    with B sharded over 'data' and F over 'seq'. The trailing n_fft-hop
    samples of the last shard (the stream tail) are dropped — callers keep
    chunk boundaries aligned to shard boundaries, as the stream engine does.
    """
    check_halo_span(n_fft, hop, frames_per_shard)
    win = jnp.asarray(window if window is not None
                      else stft.hann_symmetric(n_fft))
    win2 = win * win
    table = jnp.stack([jnp.asarray(g1_lin, jnp.float32),
                       jnp.asarray(g2_lin, jnp.float32)])
    n_seq = mesh.shape["seq"]
    F_loc = frames_per_shard

    def per_file(frames, s0, n_valid):
        # frames: [F_loc, C, n_fft] local shard of one file
        seq_i = jax.lax.axis_index("seq")
        f0 = seq_i * F_loc
        valid = (f0 + jnp.arange(F_loc)) < n_valid
        levels = frame_levels_dbfs(jnp.transpose(frames, (0, 2, 1)))
        states, carry = _sharded_gate_updelay(
            levels, ton, toff, delay_frames, s0, valid)
        gains = jnp.take(table, states - 1, axis=0)
        y = stft.apply_gain_bank(frames, win, gains)
        mask = valid.astype(jnp.float32)
        y = y * mask[:, None, None]
        emit, _, _ = _ola_halo_emit(y, win2, mask, hop, F_loc, n_seq)
        return emit, states, carry

    def step(frames, s0, n_valid):
        emit, states, carry = jax.vmap(per_file)(frames, s0, n_valid)
        return emit, states, carry

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P("data", "seq", None, None), P("data"), P("data")),
        out_specs=(P("data", "seq", None), P("data", "seq"), P("data")),
        check_vma=False)  # carry is replicated over 'seq' by construction

    @jax.jit
    def run(frames, s0, n_valid):
        return sharded(frames, s0, n_valid)

    return run


def sharded_stream_step(mesh: Mesh, n_fft: int, hop: int,
                        frames_per_shard: int, channels: int,
                        ton: float, toff: float, delay_frames: int,
                        g1_lin, g2_lin, window=None):
    """sharded_process_step with OLA tail carry across super-chunks — the
    building block of the file->file sharded CLI path (parallel.stream).

    Returns fn(frames [B, F, C, n_fft], s0 [B], n_valid [B],
               in_tail_y [B, n_fft-hop, C], in_tail_w [B, n_fft-hop]) ->
        (emit [B, F*hop, C], levels [B, F], states [B, F], carry [B],
         out_tail_y [B, n_seq*(n_fft-hop), C], out_tail_w [B, n_seq*...])
    where only the LAST tail block of out_tail_* (the stream tail of the
    last 'seq' shard) is meaningful — slice [-(n_fft-hop):] on host. The
    in_tails are added to shard 0's head (the previous super-chunk's
    carried overlap), exactly like the single-device engine's carried
    (out_tail, w_tail)."""
    check_halo_span(n_fft, hop, frames_per_shard)
    win = jnp.asarray(window if window is not None
                      else stft.hann_symmetric(n_fft))
    win2 = win * win
    table = jnp.stack([jnp.asarray(g1_lin, jnp.float32),
                       jnp.asarray(g2_lin, jnp.float32)])
    n_seq = mesh.shape["seq"]
    F_loc = frames_per_shard

    def per_file(frames, s0, n_valid, in_ty, in_tw):
        seq_i = jax.lax.axis_index("seq")
        f0 = seq_i * F_loc
        valid = (f0 + jnp.arange(F_loc)) < n_valid
        levels = frame_levels_dbfs(jnp.transpose(frames, (0, 2, 1)))
        states, carry = _sharded_gate_updelay(
            levels, ton, toff, delay_frames, s0, valid)
        gains = jnp.take(table, states - 1, axis=0)
        y = stft.apply_gain_bank(frames, win, gains)
        mask = valid.astype(jnp.float32)
        y = y * mask[:, None, None]
        emit, t_y, t_w = _ola_halo_emit(y, win2, mask, hop, F_loc, n_seq,
                                        in_ty, in_tw)
        return emit, levels, states, carry, t_y, t_w

    def step(frames, s0, n_valid, in_ty, in_tw):
        return jax.vmap(per_file)(frames, s0, n_valid, in_ty, in_tw)

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P("data", "seq", None, None), P("data"), P("data"),
                  P("data"), P("data")),
        out_specs=(P("data", "seq", None), P("data", "seq"),
                   P("data", "seq"), P("data"),
                   P("data", "seq", None), P("data", "seq")),
        check_vma=False)

    return jax.jit(sharded)


def sharded_xfade_stream_step(mesh: Mesh, n_fft: int, hop: int,
                              frames_per_shard: int, channels: int,
                              ton: float, toff: float, delay_frames: int,
                              alpha_step: float, g1_db, g2_db,
                              window=None):
    """sharded_xfade_step with OLA tail carry across super-chunks (the
    crossfade variant of the file->file sharded CLI path).

    fn(frames [B, F, C, n_fft], s0 [B], alpha0 [B], n_valid [B],
       in_tail_y [B, tail, C], in_tail_w [B, tail]) ->
        (emit [B, F*hop, C], levels [B, F], states [B, F], alpha [B, F],
         gate_carry [B], alpha_carry [B],
         out_tail_y [B, n_seq*tail, C], out_tail_w [B, n_seq*tail])
    with only the last tail block of out_tail_* meaningful (see
    sharded_stream_step)."""
    check_halo_span(n_fft, hop, frames_per_shard)
    win = jnp.asarray(window if window is not None
                      else stft.hann_symmetric(n_fft))
    win2 = win * win
    g1_db = jnp.asarray(g1_db, jnp.float32)
    g2_db = jnp.asarray(g2_db, jnp.float32)
    n_seq = mesh.shape["seq"]
    F_loc = frames_per_shard

    def per_file(frames, s0, alpha0, n_valid, in_ty, in_tw):
        seq_i = jax.lax.axis_index("seq")
        f0 = seq_i * F_loc
        valid = (f0 + jnp.arange(F_loc)) < n_valid
        levels = frame_levels_dbfs(jnp.transpose(frames, (0, 2, 1)))
        states, gate_carry = _sharded_gate_updelay(
            levels, ton, toff, delay_frames, s0, valid)
        targets = (states == 2).astype(jnp.float32)
        alpha, alpha_carry = _sharded_alpha_ramp(
            targets, jnp.float32(alpha_step), alpha0, valid)
        mixed_db = ((1.0 - alpha)[:, None] * g1_db[None, :]
                    + alpha[:, None] * g2_db[None, :])
        gains = 10.0 ** (mixed_db / 20.0)
        y = stft.apply_gain_bank(frames, win, gains.astype(jnp.float32))
        mask = valid.astype(jnp.float32)
        y = y * mask[:, None, None]
        emit, t_y, t_w = _ola_halo_emit(y, win2, mask, hop, F_loc, n_seq,
                                        in_ty, in_tw)
        return (emit, levels, states, alpha, gate_carry, alpha_carry,
                t_y, t_w)

    def step(frames, s0, alpha0, n_valid, in_ty, in_tw):
        return jax.vmap(per_file)(frames, s0, alpha0, n_valid, in_ty,
                                  in_tw)

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P("data", "seq", None, None), P("data"), P("data"),
                  P("data"), P("data"), P("data")),
        out_specs=(P("data", "seq", None), P("data", "seq"),
                   P("data", "seq"), P("data", "seq"), P("data"),
                   P("data"), P("data", "seq", None), P("data", "seq")),
        check_vma=False)

    return jax.jit(sharded)


def frame_batch(signals: np.ndarray, n_fft: int, hop: int,
                n_frames: int) -> jnp.ndarray:
    """Host helper: frame a [B, S, C] batch into [B, F, C, n_fft]."""
    outs = [np.asarray(stft.frame_signal(jnp.asarray(s), n_fft, hop,
                                         n_frames)) for s in signals]
    return jnp.asarray(np.stack(outs))
