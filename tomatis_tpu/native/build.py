"""Build + load the native C++ components.

Shared objects are compiled on first use with g++ (-O2 -shared -fPIC) and
cached next to the sources in build/; a source-mtime check triggers
rebuilds. No external build system needed for these single-TU libraries.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_HERE, "build")
_LOCK = threading.Lock()
_CACHE: dict = {}


def _compile(src: str, out: str):
    os.makedirs(_BUILD_DIR, exist_ok=True)
    # compile to a process-unique temp and publish with an atomic rename:
    # concurrent processes (e.g. sharded CLI workers on a fresh checkout)
    # may race here, and a reader must never dlopen a half-written .so
    tmp = f"{out}.{os.getpid()}.tmp"
    base = ["g++", "-std=c++17", "-O3", "-funroll-loops", "-shared",
            "-fPIC", src, "-o", tmp]
    # the .so is built on the machine that runs it (never shipped), so
    # -march=native is safe and lets the wire codec's hot loops
    # auto-vectorize (AVX2/AVX-512 where present); retried without for
    # compilers/platforms that reject the flag
    cmd = base[:1] + ["-march=native"] + base[1:]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            cmd = base
            proc = subprocess.run(cmd, capture_output=True, text=True)
    except FileNotFoundError:
        raise RuntimeError(
            "native build needs a C++ compiler but g++ was not found. "
            "Install g++ (e.g. `apt install g++`) or stay on the pure "
            "fallbacks: FLAC decode and the wire codec degrade "
            "automatically; FLAC *encode* has no pure path — write .wav "
            "instead (the processors fall back to .wav on their own).")
    if proc.returncode != 0:
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise RuntimeError(
            f"native build failed: {' '.join(cmd)}\n{proc.stderr}")
    os.replace(tmp, out)


def load_library(name: str) -> ctypes.CDLL:
    """Load lib<name>.so built from <name>.cpp, compiling if stale."""
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        if os.environ.get("TOMATIS_NO_NATIVE"):
            # test/ops hook: behave exactly like a machine without g++
            raise RuntimeError(
                "native components disabled by TOMATIS_NO_NATIVE")
        src = os.path.join(_HERE, f"{name}.cpp")
        so = os.path.join(_BUILD_DIR, f"lib{name}.so")
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            _compile(src, so)
        lib = ctypes.CDLL(so)
        _CACHE[name] = lib
        return lib
