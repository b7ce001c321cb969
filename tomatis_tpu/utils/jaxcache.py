"""Persistent XLA compilation cache.

Every fresh CLI process pays a multi-second jit of the 4096-FFT chunk
executable before the stream can start; with the persistent cache the
second and later invocations load the compiled binary from disk instead.
Opt out with TOMATIS_NO_COMPILE_CACHE=1 or point TOMATIS_COMPILE_CACHE at
a different directory.
"""
from __future__ import annotations

import os
import sys

_DONE = False


def pin_hash_seed(argv: list[str] | None = None) -> None:
    """Re-exec the process with PYTHONHASHSEED=0 so compile-cache keys
    are stable across sessions.

    JAX 0.9's lowering embeds Python-hash-dependent ordering in the
    serialized HLO it keys the persistent compilation cache by: two
    byte-identical warmup runs in fresh processes wrote DISJOINT
    jit_chunk_fn cache entries, and r04's driver bench recompiled 13
    executables over a 12-entry cache (BENCH_r04.json compile_cache).
    With PYTHONHASHSEED=0 the keys are bit-stable across processes
    (verified: two fresh runs, identical entry sets). Entry points that
    want cross-session cache hits call this FIRST, before jax imports.

    argv: the exec argv tail; defaults to sys.argv (correct for
    script-style entry points like bench.py). Module entry points pass
    ["-m", "pkg.mod"] + sys.argv[1:]. No-op when the seed is already
    pinned. jax being imported already is NOT a reason to skip — this
    host's site hook preloads jax into every interpreter — because the
    re-exec'd process re-imports it under the pinned seed.
    """
    cur = os.environ.get("PYTHONHASHSEED", "")
    if cur.isdigit():
        return  # already stable across sessions (any fixed seed works)
    os.environ["PYTHONHASHSEED"] = "0"
    args = argv if argv is not None else sys.argv
    os.execv(sys.executable, [sys.executable] + list(args))

# Repo-local cache directory: persists across processes in this worktree
# (gitignored, ~360 MB once warm — and measured warmups show a cache HIT
# still pays 150-350 s of executable LOAD over the tunnel, so committing
# it would not speed the driver's bench run). Resolved relative to this
# file so it works from any CWD.
_REPO_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".xla_cache")


def cache_path() -> str:
    """The directory the persistent XLA compilation cache lives in.

    Priority: TOMATIS_COMPILE_CACHE env var > repo-local `.xla_cache`
    (when the directory exists — i.e. was committed or created by a
    previous run here) > per-user ~/.cache/tomatis_tpu/xla_cache.
    """
    env = os.environ.get("TOMATIS_COMPILE_CACHE")
    if env:
        return env
    # CPU-pinned processes (tests, analysis runs) must NOT write into the
    # committed repo cache: XLA:CPU AOT entries bake in the compiling
    # host's CPU features (loading one on a different machine warns of
    # possible SIGILL), while the accelerator entries we commit are
    # device-targeted. Only accelerator-capable processes use the repo
    # cache.
    pinned = (os.environ.get("TOMATIS_PLATFORM")
              or os.environ.get("JAX_PLATFORMS", ""))
    if pinned.strip().lower() != "cpu" and os.path.isdir(_REPO_CACHE):
        return _REPO_CACHE
    return os.path.join(os.path.expanduser("~"), ".cache", "tomatis_tpu",
                        "xla_cache")


def enable_compilation_cache() -> None:
    """Idempotently point JAX at a per-user on-disk compilation cache."""
    global _DONE
    if _DONE or os.environ.get("TOMATIS_NO_COMPILE_CACHE"):
        _DONE = True
        return
    _DONE = True
    path = cache_path()
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that takes meaningful time to build
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never fail a run over it
