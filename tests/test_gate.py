import numpy as np
import jax.numpy as jnp
import pytest

from tomatis_tpu.ops import gate
from tests.oracle import refdsp


def _adversarial_levels(rng, n, ton, toff):
    """Level sequences hugging the thresholds to exercise every edge."""
    kind = rng.integers(0, 4, n)
    base = rng.uniform(toff - 3, ton + 3, n)
    base[kind == 0] = ton + rng.uniform(0, 0.5, (kind == 0).sum())
    base[kind == 1] = toff - rng.uniform(0, 0.5, (kind == 1).sum())
    base[kind == 2] = ton
    base[kind == 3] = toff
    return base


@pytest.mark.parametrize("up_delay_ms,hop", [(0.0, 2048), (250.0, 2048),
                                             (250.0, 1024), (100.0, 4096),
                                             (1000.0, 2048)])
def test_gate_updelay_matches_reference_loop(up_delay_ms, hop):
    sr = 48000
    rng = np.random.default_rng(42)
    T, hyst = -40.0, 3.0
    ton, toff = T + hyst / 2, T - hyst / 2
    levels = _adversarial_levels(rng, 400, ton, toff)
    up_samples = int(sr * up_delay_ms / 1000.0)

    want = refdsp.gate_updelay_loop(levels, ton, toff, up_samples, hop, start0=0)
    D = gate.updelay_frames(up_samples, hop)
    got, _ = gate.gate_updelay(jnp.asarray(levels), ton, toff, D)
    np.testing.assert_array_equal(np.asarray(got), want)
    # sequential scan form agrees too
    got2, _ = gate.gate_updelay_scan(jnp.asarray(levels), ton, toff, D)
    np.testing.assert_array_equal(np.asarray(got2), want)


def test_gate_updelay_negative_start_coordinates():
    # the standard processor starts frames at -pad; state advances on pad
    # frames too (ref src/process_tomatis.py:310-316). Frame-count form is
    # invariant to the absolute origin.
    sr, hop = 48000, 2048
    rng = np.random.default_rng(3)
    ton, toff = -38.5, -41.5
    levels = _adversarial_levels(rng, 200, ton, toff)
    up = int(sr * 250.0 / 1000.0)
    want = refdsp.gate_updelay_loop(levels, ton, toff, up, hop, start0=-2048)
    # start0=-pad shifts all absolute coords equally -> same frame deltas
    got, _ = gate.gate_updelay(jnp.asarray(levels), ton, toff,
                               gate.updelay_frames(up, hop))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_gate_updelay_chunked_carry_equals_oneshot():
    rng = np.random.default_rng(7)
    ton, toff = -38.5, -41.5
    levels = _adversarial_levels(rng, 513, ton, toff)
    D = 6
    full, _ = gate.gate_updelay(jnp.asarray(levels), ton, toff, D)
    parts = []
    carry = None
    for s in range(0, 513, 128):
        chunk = jnp.asarray(levels[s:s + 128])
        states, seq = gate.gate_updelay(chunk, ton, toff, D, init_state=carry)
        carry = seq[-1]
        parts.append(np.asarray(states))
    np.testing.assert_array_equal(np.concatenate(parts), np.asarray(full))


@pytest.mark.parametrize("min_hold", [1, 3, 6, 12])
def test_gate_minhold_matches_reference_loop(min_hold):
    rng = np.random.default_rng(5)
    T, hyst = -40.0, 3.0
    levels = _adversarial_levels(rng, 400, T + hyst / 2, T - hyst / 2)
    want = refdsp.gate_minhold_loop(levels, T, hyst, min_hold)
    got, _ = gate.gate_minhold(jnp.asarray(levels), T + hyst / 2, T - hyst / 2,
                               min_hold)
    np.testing.assert_array_equal(np.asarray(got), want)
    got2, _ = gate.gate_minhold_scan(jnp.asarray(levels), T + hyst / 2,
                                     T - hyst / 2, min_hold)
    np.testing.assert_array_equal(np.asarray(got2), want)


def test_gate_minhold_chunked_carry():
    rng = np.random.default_rng(9)
    levels = _adversarial_levels(rng, 300, -38.5, -41.5)
    H = 6
    full, _ = gate.gate_minhold(jnp.asarray(levels), -38.5, -41.5, H)
    parts, carry = [], None
    for s in range(0, 300, 77):
        states, seq = gate.gate_minhold(jnp.asarray(levels[s:s + 77]),
                                        -38.5, -41.5, H, init_state=carry)
        carry = seq[-1]
        parts.append(np.asarray(states))
    np.testing.assert_array_equal(np.concatenate(parts), np.asarray(full))


@pytest.mark.parametrize("xfade_frames", [1, 6, 12])
def test_alpha_ramp_matches_reference_loop(xfade_frames):
    rng = np.random.default_rng(11)
    targets = (rng.random(500) > 0.6).astype(np.float64)
    # make some long runs so alpha saturates
    targets[100:200] = 1.0
    targets[200:350] = 0.0
    step = 1.0 / xfade_frames
    want = refdsp.alpha_ramp_loop(targets, step, alpha0=0.0)
    got = np.asarray(gate.alpha_ramp(jnp.asarray(targets), step, 0.0))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_alpha_ramp_snap_first():
    targets = np.array([1.0, 1.0, 0.0, 0.0, 0.0, 1.0])
    step = 0.5
    got = np.asarray(gate.alpha_ramp_snap_first(jnp.asarray(targets), step))
    # reference: alpha[0] = target[0] then rate-limited
    want = [1.0, 1.0, 0.5, 0.0, 0.0, 0.5]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_state_run_stats():
    states = np.array([1, 1, 2, 2, 2, 1, 2])
    st = gate.state_run_stats(states)
    assert st["switch_count"] == 3
    assert st["c2_ratio"] == pytest.approx(4 / 7)
    np.testing.assert_array_equal(st["run_lengths"], [2, 3, 1, 1])
