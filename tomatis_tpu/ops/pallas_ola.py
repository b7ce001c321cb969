"""Pallas TPU kernel: K-way overlap-add.

The OLA in ops/stft.py is K shifted `at[].add` updates — XLA materializes
the accumulator between adds. This kernel produces each hop-sized output
tile in one VMEM pass: tile t = sum over r of yp[t + r, :, k-1-r, :]
where yp is the frame tensor reshaped to hop-blocks and zero-padded by
k-1 frames on each side, so every tile reads one contiguous (k, C, k, hop)
block and no grid step ever revisits an output block (no accumulation
hazards).

Used on TPU for the engine's hot path; everywhere else the XLA
formulation is kept (and is the oracle for the interpret-mode parity
tests in tests/test_pallas.py).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

try:  # pallas is TPU-oriented; keep import soft for CPU-only environs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def pallas_available() -> bool:
    if not _HAVE_PALLAS or os.environ.get("TOMATIS_NO_PALLAS"):
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _ola_kernel(k: int):
    def kernel(*refs):
        out_ref = refs[-1]
        # ref r holds frame row t+r; its hop-block (k-1-r) lands on tile t
        acc = refs[0][0, :, k - 1, :]
        for r in range(1, k):
            acc = acc + refs[r][0, :, k - 1 - r, :]
        out_ref[0] = acc
    return kernel


@functools.partial(jax.jit, static_argnames=("hop", "interpret"))
def overlap_add_pallas(y, hop: int, interpret: bool = False):
    """Overlap-add y [F, C, n_fft] at `hop` (n_fft % hop == 0).

    Returns [(F + n_fft/hop - 1) * hop, C]; the first (F-1)*hop + n_fft
    samples match stft.overlap_add (the remainder is zero padding).

    Block index maps count in units of whole blocks, so the k overlapping
    frame windows of one output tile are expressed as k single-row views
    of the same (padded) frame tensor, offset by r rows each.
    """
    F, C, n_fft = y.shape
    if n_fft % hop:
        raise ValueError("pallas OLA requires hop | n_fft")
    k = n_fft // hop
    T = F + k - 1                      # output tiles of hop samples
    yp = y.reshape(F, C, k, hop)
    yp = jnp.pad(yp, ((k - 1, k - 1), (0, 0), (0, 0), (0, 0)))

    def row_spec(r):
        return pl.BlockSpec((1, C, k, hop),
                            lambda t, r=r: (t + r, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _ola_kernel(k),
        grid=(T,),
        in_specs=[row_spec(r) for r in range(k)],
        out_specs=pl.BlockSpec((1, C, hop), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, C, hop), y.dtype),
        interpret=interpret,
    )(*([yp] * k))
    return jnp.transpose(out, (0, 2, 1)).reshape(T * hop, C)
