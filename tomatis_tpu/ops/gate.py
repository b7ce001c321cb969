"""Gate state machines as parallel (associative) scans.

The reference implements three sequential per-frame Python loops:

- variant A: hysteresis + sample-based up-switch delay with cancel-on-dip
  (ref src/process_tomatis.py:373-385)
- variant B: hysteresis + min-hold frame counter
  (ref src/process_tomatis_adaptive.py:87-121)
- crossfade alpha ramp: rate-limited approach to a 0/1 target
  (ref src/process_tomatis_xfade.py:251-262, src/process_tomatis_adaptive.py:251-265)

A per-frame `lax.scan` would serialize ~30k frames/hour-of-audio on the TPU's
scalar core. Instead we exploit that each per-frame update is a function from
a *small finite* carry space to itself:

- A/B: the carry (gate state, counter) lives in a space of D+2 (resp. 2H+2)
  elements, so a frame is a transition *table*; composition of tables is a
  gather, which is associative -> `jax.lax.associative_scan` gives all prefix
  states in O(log F) depth of [F, S] gathers, fully vectorized on the VPU.
- the alpha ramp update  x -> min(hi, max(lo, x+b))  is a clip-affine map;
  these maps are closed under composition, so the ramp is likewise an
  associative scan over (b, lo, hi) triples.

Both formulations are exact (integer table composition; min/max algebra), not
approximations of the reference semantics.

State encoding (variant A):  s in [0, D]  = C1 with `s` consecutive frames
>= Ton immediately before the current frame; s = D+1 = C2. A switch C1->C2
fires on a frame with level >= Ton when the run count has reached
D = ceil(up_delay_samples / hop)  (next_start >= pending_c2_at in reference
coordinates: (j-k)*hop >= up_delay_samples  <=>  j-k >= D).

State encoding (variant B):  s = state_idx*(H+1) + h,  state_idx 0=C1 / 1=C2,
h = min(frames_since_switch, H); initial h = H (switching allowed at once).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

C1, C2 = 1, 2
# numpy, not jnp: a module-level jnp scalar would initialize the JAX
# backend (a TPU attach, minutes on a busy tunnel) on ANY import of
# tomatis_tpu.ops — including pure-host paths like WAV int24 reads
import numpy as _np  # noqa: E402

_BIG = _np.float32(1e9)


def updelay_frames(up_delay_samples: int, hop: int) -> int:
    """Frame-count equivalent of the sample-based up delay: smallest d with
    d*hop >= up_delay_samples (ref src/process_tomatis.py:285,376-379)."""
    return -(-int(up_delay_samples) // int(hop))


def _compose_tables(t_early, t_late):
    """(t_late o t_early)[s] = t_late[t_early[s]] along the last axis."""
    return jnp.take_along_axis(t_late, t_early, axis=-1)


def compose_tables(t_early, t_late):
    """Public alias: compose transition tables (earliest applied first)."""
    return _compose_tables(t_early, t_late)


def updelay_tables(levels, ton, toff, delay_frames: int, valid=None):
    """Per-frame transition tables [F, S] for the variant-A gate
    (S = delay_frames + 2; see module docstring for the state encoding)."""
    D = int(delay_frames)
    S = D + 2
    a = levels >= ton
    b = levels <= toff
    s = jnp.arange(S, dtype=jnp.int32)
    c1_next = jnp.where(s >= D, D + 1, s + 1)
    tbl_c1 = jnp.where(a[:, None], c1_next[None, :D + 1], 0)
    tbl_c2 = jnp.where(b, 0, D + 1).astype(jnp.int32)[:, None]
    tables = jnp.concatenate([tbl_c1.astype(jnp.int32), tbl_c2], axis=1)
    if valid is not None:
        tables = jnp.where(valid[:, None], tables, s[None, :])
    return tables


def updelay_states_from_index(final, delay_frames: int):
    """Carry-space index [F] -> gate state in {1, 2}."""
    return jnp.where(final == delay_frames + 1, C2, C1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("delay_frames",))
def gate_updelay(levels, ton, toff, delay_frames: int, init_state=None,
                 valid=None):
    """Variant A gate over per-frame levels; returns states [F] in {1,2}.

    Exact parallel form of ref src/process_tomatis.py:373-385. The returned
    state for frame j is the post-update state used for that frame's gain.

    init_state: optional int32 scalar index into the S = delay_frames+2 carry
    space (for chunked streaming); defaults to 0 (C1, run count 0).
    valid: optional [F] bool; invalid frames are identity transitions (used
    for the zero-padded tail of a fixed-shape chunk).
    """
    D = int(delay_frames)
    tables = updelay_tables(levels, ton, toff, D, valid=valid)
    prefix = jax.lax.associative_scan(_compose_tables, tables, axis=0)
    s0 = jnp.int32(0) if init_state is None else init_state.astype(jnp.int32)
    final = jnp.take_along_axis(
        prefix, jnp.broadcast_to(s0, (prefix.shape[0], 1)), axis=1)[:, 0]
    states = updelay_states_from_index(final, D)
    return states, final  # final[-1] is the carry for the next chunk


def gate_updelay_scan(levels, ton, toff, delay_frames: int, init_state=None):
    """Sequential lax.scan version of variant A (for validation/debug)."""
    D = int(delay_frames)

    def step(carry, level):
        s = carry  # index in [0, D+1]
        a = level >= ton
        b = level <= toff
        in_c1 = s <= D
        c1_next = jnp.where(a, jnp.where(s >= D, D + 1, s + 1), 0)
        c2_next = jnp.where(b, 0, D + 1)
        nxt = jnp.where(in_c1, c1_next, c2_next).astype(jnp.int32)
        return nxt, nxt

    s0 = jnp.int32(0) if init_state is None else init_state.astype(jnp.int32)
    last, seq = jax.lax.scan(step, s0, levels)
    states = jnp.where(seq == D + 1, C2, C1).astype(jnp.int32)
    return states, seq


def minhold_tables(levels, ton, toff, min_hold_frames: int, valid=None):
    """Per-frame transition tables of the variant-B (min-hold) gate over
    the carry space s = state_idx*(H+1) + min(frames_since, H). Invalid
    frames get the identity table (shared with the sharded block scan)."""
    H = int(min_hold_frames)
    S = 2 * (H + 1)
    a = levels >= ton
    b = levels <= toff

    s = jnp.arange(S, dtype=jnp.int32)
    state_idx = s // (H + 1)       # 0 = C1, 1 = C2
    h = s % (H + 1)
    h1 = jnp.minimum(h + 1, H)
    can = h1 >= H
    # next index if the switch condition holds vs not, per entry state
    stay = state_idx * (H + 1) + h1
    flip = (1 - state_idx) * (H + 1)  # switched state with h = 0

    cond_c1 = a[:, None] & can[None, :] & (state_idx[None, :] == 0)
    cond_c2 = b[:, None] & can[None, :] & (state_idx[None, :] == 1)
    tables = jnp.where(cond_c1 | cond_c2, flip[None, :],
                       stay[None, :]).astype(jnp.int32)
    if valid is not None:
        tables = jnp.where(valid[:, None], tables, s[None, :])
    return tables


def minhold_states_from_index(final, min_hold_frames: int):
    """Map final carry indices to C1/C2 states."""
    return jnp.where(final >= int(min_hold_frames) + 1, C2, C1).astype(
        jnp.int32)


@functools.partial(jax.jit, static_argnames=("min_hold_frames",))
def gate_minhold(levels, ton, toff, min_hold_frames: int, init_state=None,
                 valid=None):
    """Variant B gate (min-hold) over per-frame levels; returns states [F].

    Exact parallel form of ref src/process_tomatis_adaptive.py:87-121:
        frames_since += 1
        if frames_since >= H: allow switch (and reset counter on switch)
    Carry index s = state_idx*(H+1) + h with h = min(frames_since, H),
    initial h = H so the first frame may switch immediately.
    """
    H = int(min_hold_frames)
    tables = minhold_tables(levels, ton, toff, H, valid=valid)
    prefix = jax.lax.associative_scan(_compose_tables, tables, axis=0)
    s0 = jnp.int32(H) if init_state is None else init_state.astype(jnp.int32)
    final = jnp.take_along_axis(
        prefix, jnp.broadcast_to(s0, (prefix.shape[0], 1)), axis=1)[:, 0]
    states = jnp.where(final >= H + 1, C2, C1).astype(jnp.int32)
    return states, final


def gate_minhold_scan(levels, ton, toff, min_hold_frames: int, init_state=None):
    """Sequential lax.scan version of variant B (for validation/debug)."""
    H = int(min_hold_frames)

    def step(s, level):
        state_idx = s // (H + 1)
        h1 = jnp.minimum(s % (H + 1) + 1, H)
        can = h1 >= H
        do_flip = jnp.where(state_idx == 0, (level >= ton) & can,
                            (level <= toff) & can)
        nxt = jnp.where(do_flip, (1 - state_idx) * (H + 1),
                        state_idx * (H + 1) + h1).astype(jnp.int32)
        return nxt, nxt

    s0 = jnp.int32(H) if init_state is None else init_state.astype(jnp.int32)
    last, seq = jax.lax.scan(step, s0, levels)
    states = jnp.where(seq >= H + 1, C2, C1).astype(jnp.int32)
    return states, seq


def _compose_clip(f, g):
    """Compose clip-affine maps applied f-then-g.

    f = (a1,b1,c1) meaning x -> min(c1, max(b1, x+a1)); likewise g.
    g o f = (a1+a2, max(b2, b1+a2), min(c2, max(b2, c1+a2))).
    """
    a1, b1, c1 = f
    a2, b2, c2 = g
    return (a1 + a2,
            jnp.maximum(b2, b1 + a2),
            jnp.minimum(c2, jnp.maximum(b2, c1 + a2)))


@jax.jit
def alpha_ramp(targets, step, alpha0, valid=None):
    """Rate-limited crossfade ramp toward per-frame 0/1 targets.

    Exact parallel form of (ref src/process_tomatis_xfade.py:254-262):
        diff = target - alpha
        alpha = target            if |diff| <= step
        alpha += step*sign(diff)  otherwise
    which for target=1 is x -> min(1, x+step) and for target=0 is
    x -> max(0, x-step): clip-affine maps composed by associative scan.

    targets: [F] float (0.0 or 1.0); step: scalar; alpha0: scalar initial
    alpha *before* the first frame's update. Returns alpha [F] after each
    frame's update (what the reference logs / uses for that frame's gain).
    """
    targets = targets.astype(jnp.float32)
    step = jnp.float32(step)
    a = jnp.where(targets > 0.5, step, -step)
    b = jnp.where(targets > 0.5, -_BIG, 0.0)
    c = jnp.where(targets > 0.5, 1.0, _BIG)
    if valid is not None:
        a = jnp.where(valid, a, 0.0)
        b = jnp.where(valid, b, -_BIG)
        c = jnp.where(valid, c, _BIG)
    pa, pb, pc = jax.lax.associative_scan(_compose_clip, (a, b, c), axis=0)
    return jnp.minimum(pc, jnp.maximum(pb, jnp.float32(alpha0) + pa))


def alpha_ramp_snap_first(targets, step):
    """Adaptive-processor variant: alpha[0] = target[0], ramp afterwards
    (ref src/process_tomatis_adaptive.py:256-265)."""
    first = targets[:1].astype(jnp.float32)
    rest = alpha_ramp(targets[1:], step, first[0]) if targets.shape[0] > 1 \
        else jnp.zeros((0,), jnp.float32)
    return jnp.concatenate([first, rest])


def state_run_stats(states):
    """Run-length / switch statistics used by the adaptive processor
    (ref src/process_tomatis_adaptive.py:228-249). Host-side numpy helper."""
    import numpy as np
    states = np.asarray(states)
    if states.size == 0:
        return dict(c2_ratio=0.0, switch_count=0, run_lengths=np.zeros(0, np.int64))
    switches = np.flatnonzero(states[1:] != states[:-1])
    run_ends = np.r_[switches, states.size - 1]
    run_starts = np.r_[0, switches + 1]
    run_lengths = run_ends - run_starts + 1
    return dict(
        c2_ratio=float(np.mean(states == C2)),
        switch_count=int(len(switches)),
        run_lengths=run_lengths,
    )
