"""Persistent XLA compilation cache.

Every fresh CLI process pays a multi-second jit of the 4096-FFT chunk
executable before the stream can start; with the persistent cache the
second and later invocations load the compiled binary from disk instead.
Opt out with TOMATIS_NO_COMPILE_CACHE=1 or point TOMATIS_COMPILE_CACHE at
a different directory.
"""
from __future__ import annotations

import os

_DONE = False


def enable_compilation_cache() -> None:
    """Idempotently point JAX at a per-user on-disk compilation cache."""
    global _DONE
    if _DONE or os.environ.get("TOMATIS_NO_COMPILE_CACHE"):
        _DONE = True
        return
    _DONE = True
    path = os.environ.get(
        "TOMATIS_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "tomatis_tpu",
                     "xla_cache"))
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that takes meaningful time to build
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never fail a run over it
