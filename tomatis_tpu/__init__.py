"""tomatis_tpu — a TPU-native (JAX/XLA/Pallas) audio-processing framework.

A from-scratch rebuild of the capabilities of xyjk0511/tomatis-audio-processor
(a gate-controlled two-state tilt filter applied to stereo audio via streaming
STFT + overlap-add), redesigned TPU-first:

- frame levels, the FFT filter bank and OLA are batched XLA ops;
- the gate state machines are O(log F) associative scans over transition
  tables instead of per-frame Python loops;
- hour-long files stream host->HBM in fixed-shape chunks with carried state
  (gate state, crossfade alpha, OLA tails), so a single compiled executable
  is reused for every chunk;
- batches of files shard over a `jax.sharding.Mesh` (data x sequence axes).

Layout:
    ops/       pure-function DSP primitives and kernels (JAX)
    engine/    the chunked streaming STFT+OLA executor and processor cores
    models/    user-facing processor pipelines (standard / crossfade / adaptive / EQ)
    analysis/  alignment, calibration, spectra, level/segment analyzers
    verify/    validation + verification + comparison suites
    parallel/  device-mesh batch processing
    io/        audio I/O (pure-Python WAV, native C++ FLAC codec)
    cli/       command-line entry points (reference-compatible flags)
    utils/     config, CSV schemas, logging
"""

__version__ = "0.1.0"

from tomatis_tpu.io import audio  # noqa: F401,E402


def __getattr__(name):
    """Lazy top-level API: keep `import tomatis_tpu` light (no jax work
    until a processor is touched)."""
    import importlib
    lazy = {
        "StandardParams": ("tomatis_tpu.models.standard", "StandardParams"),
        "process": ("tomatis_tpu.models.standard", "process"),
        "process_array": ("tomatis_tpu.models.standard", "process_array"),
        "XfadeParams": ("tomatis_tpu.models.xfade", "XfadeParams"),
        "AdaptiveParams": ("tomatis_tpu.models.adaptive", "AdaptiveParams"),
        "process_batch": ("tomatis_tpu.parallel.batch", "process_batch"),
    }
    if name in lazy:
        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
