"""Pallas OLA kernel parity (interpret mode on CPU) vs the XLA path."""
import numpy as np
import jax.numpy as jnp
import pytest

from tomatis_tpu.ops import stft
from tomatis_tpu.ops.pallas_ola import overlap_add_pallas, pallas_available


@pytest.mark.parametrize("F,C,n_fft,hop", [
    (7, 2, 256, 128),      # k=2 (the engine's default shape family)
    (5, 1, 512, 128),      # k=4
    (1, 2, 256, 128),      # single frame
    (12, 2, 384, 128),     # k=3, odd frame count
])
def test_pallas_ola_matches_xla(F, C, n_fft, hop):
    rng = np.random.default_rng(F * 1000 + n_fft)
    y = rng.standard_normal((F, C, n_fft)).astype(np.float32)
    ref = np.asarray(stft.overlap_add(jnp.asarray(y), hop))
    got = np.asarray(overlap_add_pallas(jnp.asarray(y), hop,
                                        interpret=True))
    L = (F - 1) * hop + n_fft
    np.testing.assert_allclose(got[:L], ref, atol=1e-6)
    # pallas output covers the full tile span; anything past L is padding
    assert got.shape[0] == (F + n_fft // hop - 1) * hop


def test_pallas_ola_rejects_bad_hop():
    y = jnp.zeros((3, 2, 300), jnp.float32)
    with pytest.raises(ValueError):
        overlap_add_pallas(y, 128, interpret=True)


@pytest.mark.skipif(not pallas_available(),
                    reason="needs a real TPU (Mosaic compile path)")
def test_pallas_ola_on_tpu():
    """Compiled-Mosaic parity on the engine's production shape: a Mosaic
    regression fails here by name instead of silently degrading the bench
    parity check. (The interpret-mode tests above cover semantics on CPU;
    this covers the actual TPU lowering.)"""
    rng = np.random.default_rng(7)
    F, C, n_fft, hop = 64, 2, 4096, 2048
    y = rng.standard_normal((F, C, n_fft)).astype(np.float32)
    ref = np.asarray(stft.overlap_add(jnp.asarray(y), hop))
    got = np.asarray(overlap_add_pallas(jnp.asarray(y), hop))
    L = (F - 1) * hop + n_fft
    np.testing.assert_allclose(got[:L], ref, atol=1e-5)
    assert not np.any(got[L:])
