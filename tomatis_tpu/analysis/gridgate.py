"""Grid-vectorized gate simulation for calibration search.

The reference runs a quadruple Python loop (gain x delay x hyst x T), each
iteration a sequential per-frame state machine
(ref src/calibrate_to_baseline_v2.py:84-109,241-265). Here ALL grid
combinations run as lanes of ONE `lax.scan` over the frames: the carry is
a [G]-vector of (state, pending position), each scan step is a fused
vector op on the VPU. Frame positions may be non-consecutive (the v2
calibrator simulates over music-masked frames with gaps), which is why
this uses the positional pending rule rather than the frame-count table
scan of tomatis_tpu.ops.gate.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# sentinel "no pending switch"; positions fit easily in int32 (x64 is off)
_BIG = np.int32(2 ** 31 - 1)


@jax.jit
def grid_gate_scores(levels, starts, tons, toffs, updelay_samples,
                     switch_penalty, target_states):
    """Simulate the variant-A gate for every grid lane and score it.

    levels [F] float32; starts [F] int32 (may have gaps);
    tons/toffs/updelay_samples [G]; target_states [F] int32 in {1,2}.
    Returns (scores [G], mismatches [G], switches [G]) where
    score = mismatch_rate + switch_penalty * switches.
    """
    G = tons.shape[0]
    levels = levels.astype(jnp.float32)
    tgt = target_states.astype(jnp.int32)

    def step(carry, inp):
        state, pending = carry            # [G] int32, [G] int32
        lv, st = inp                      # scalars
        a = lv >= tons
        b = lv <= toffs
        in_c1 = state == 1
        new_pending = jnp.where(
            in_c1 & a, jnp.where(pending == _BIG, st + updelay_samples,
                                 pending),
            _BIG)
        fire = in_c1 & a & (st >= new_pending)
        next_state = jnp.where(in_c1,
                               jnp.where(fire, 2, 1),
                               jnp.where(b, 1, 2)).astype(jnp.int32)
        next_pending = jnp.where(fire | ~in_c1, _BIG, new_pending)
        return (next_state, next_pending), next_state

    init = (jnp.ones(G, jnp.int32), jnp.full(G, _BIG, jnp.int32))
    (_, _), states = jax.lax.scan(step, init, (levels, starts))
    # states: [F, G]
    mism = jnp.mean((states != tgt[:, None]).astype(jnp.float32), axis=0)
    switches = jnp.sum((states[1:] != states[:-1]).astype(jnp.int32), axis=0)
    scores = mism + switch_penalty * switches.astype(jnp.float32)
    return scores, mism, switches


def grid_search(levels: np.ndarray, starts: np.ndarray,
                target_states: np.ndarray, combos, sr: int,
                switch_penalty: float):
    """Run all (T, hyst, up_ms[, extra...]) combos in one scan; return the
    best combo dict. `combos` is a list of dicts with keys T, hyst, up_ms
    (plus any passthrough keys)."""
    tons = np.array([c["T"] + c["hyst"] / 2.0 for c in combos], np.float32)
    toffs = np.array([c["T"] - c["hyst"] / 2.0 for c in combos], np.float32)
    ups = np.array([int(round(sr * c["up_ms"] / 1000.0)) for c in combos],
                   np.int32)
    scores, mism, sw = grid_gate_scores(
        jnp.asarray(levels), jnp.asarray(starts.astype(np.int32)),
        jnp.asarray(tons), jnp.asarray(toffs), jnp.asarray(ups),
        jnp.float32(switch_penalty), jnp.asarray(target_states))
    scores = np.asarray(scores)
    i = int(np.argmin(scores))
    best = dict(combos[i])
    best.update(score=float(scores[i]), mismatch=float(np.asarray(mism)[i]),
                switches=int(np.asarray(sw)[i]))
    return best
