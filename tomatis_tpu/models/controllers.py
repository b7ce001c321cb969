"""Gain controllers: the per-processor logic plugged into the stream engine.

A controller turns per-frame levels into per-frame linear gain rows, carrying
whatever sequential state its gate needs across chunk boundaries. All gate
state machines run as associative scans (tomatis_tpu.ops.gate), so a whole
chunk's states come out of O(log F) vector ops.

Numeric parameters (gain curves, thresholds, ramp steps) are *traced
arguments*, not closure constants: one compiled chunk executable serves
every file and every parameter setting that shares the static shape
configuration (engine shapes + the controller's `static_key()`).

- GateSelectController    standard processor (ref src/process_tomatis.py:373-398)
- GateXfadeController     crossfade processor (ref src/process_tomatis_xfade.py:241-292)
- StaticGainController    layer2/layer2b EQ appliers (ref src/layer2_apply_eq.py:142-215)
- AlphaGainController     adaptive one-shot pass (ref src/process_tomatis_adaptive.py:283-327)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tomatis_tpu.ops import gate as gate_ops
from tomatis_tpu.ops.dsp import db_to_lin


class GateSelectController:
    """Hysteresis + up-delay gate selecting between two gain curves."""

    LOG_KEYS = ("states",)

    def __init__(self, g1_lin, g2_lin, ton: float, toff: float,
                 delay_frames: int):
        self.table = jnp.stack([jnp.asarray(g1_lin, jnp.float32),
                                jnp.asarray(g2_lin, jnp.float32)])
        self.ton = float(ton)
        self.toff = float(toff)
        self.delay_frames = int(delay_frames)

    def static_key(self):
        return ("select", self.delay_frames, self.table.shape[1])

    def params(self):
        return (self.table, jnp.float32(self.ton), jnp.float32(self.toff))

    def init_carry(self):
        return jnp.int32(0)  # C1, run count 0

    def step(self, levels, valid, carry, params):
        table, ton, toff = params
        states, seq = gate_ops.gate_updelay(
            levels, ton, toff, self.delay_frames,
            init_state=carry, valid=valid)
        gains = jnp.take(table, states - 1, axis=0)
        return gains, {"states": states}, seq[-1]


class GateXfadeController:
    """Gate + rate-limited alpha crossfade, gains blended in the dB domain
    (ref src/process_tomatis_xfade.py:251-274)."""

    LOG_KEYS = ("states", "alpha")

    def __init__(self, g1_db, g2_db, ton: float, toff: float,
                 delay_frames: int, xfade_frames: int):
        self.g1_db = jnp.asarray(g1_db, jnp.float32)
        self.g2_db = jnp.asarray(g2_db, jnp.float32)
        self.ton = float(ton)
        self.toff = float(toff)
        self.delay_frames = int(delay_frames)
        # ref: alpha_step = 1/max(1, xfade_frames) (xfade.py:154-155)
        self.alpha_step = 1.0 / max(1, int(xfade_frames))

    def static_key(self):
        return ("xfade", self.delay_frames, self.g1_db.shape[0])

    def params(self):
        return (self.g1_db, self.g2_db, jnp.float32(self.ton),
                jnp.float32(self.toff), jnp.float32(self.alpha_step))

    def init_carry(self):
        return (jnp.int32(0), jnp.float32(0.0))

    def step(self, levels, valid, carry, params):
        g1_db, g2_db, ton, toff, alpha_step = params
        gate_carry, alpha0 = carry
        states, seq = gate_ops.gate_updelay(
            levels, ton, toff, self.delay_frames,
            init_state=gate_carry, valid=valid)
        targets = (states == 2).astype(jnp.float32)
        alpha = gate_ops.alpha_ramp(targets, alpha_step, alpha0, valid=valid)
        mixed_db = ((1.0 - alpha)[:, None] * g1_db[None, :]
                    + alpha[:, None] * g2_db[None, :])
        gains = db_to_lin(mixed_db)
        return gains, {"states": states, "alpha": alpha}, (seq[-1], alpha[-1])


class AlphaGainController:
    """Per-frame dB-domain blend driven by a precomputed whole-file alpha
    track (the adaptive processor's one-shot pass,
    ref src/process_tomatis_adaptive.py:283-327). The carry is the running
    frame offset into the alpha array; each chunk slices its window."""

    LOG_KEYS = ("alpha",)

    def __init__(self, g1_db, g2_db, alphas):
        self.g1_db = jnp.asarray(g1_db, jnp.float32)
        self.g2_db = jnp.asarray(g2_db, jnp.float32)
        self.alphas = jnp.asarray(alphas, jnp.float32)

    def static_key(self):
        return ("alphagain", self.g1_db.shape[0], self.alphas.shape[0])

    def params(self):
        return (self.g1_db, self.g2_db, self.alphas)

    def init_carry(self):
        return jnp.int32(0)

    def step(self, levels, valid, carry, params):
        g1_db, g2_db, alphas = params
        F = levels.shape[0]
        alpha = jax.lax.dynamic_slice(alphas, (carry,), (F,))
        mixed_db = ((1.0 - alpha)[:, None] * g1_db[None, :]
                    + alpha[:, None] * g2_db[None, :])
        gains = db_to_lin(mixed_db)
        return gains, {"alpha": alpha}, carry + F


class StaticGainController:
    """A single gate-free gain row (EQ appliers)."""

    LOG_KEYS = ()

    def __init__(self, gain_lin):
        self.gain = jnp.asarray(gain_lin, jnp.float32)

    def static_key(self):
        return ("static", self.gain.shape[0])

    def params(self):
        return (self.gain,)

    def init_carry(self):
        return jnp.int32(0)

    def step(self, levels, valid, carry, params):
        (gain,) = params
        F = levels.shape[0]
        gains = jnp.broadcast_to(gain[None, :], (F, gain.shape[0]))
        return gains, {}, carry
