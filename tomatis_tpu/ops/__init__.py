from tomatis_tpu.utils.jaxcache import enable_compilation_cache

# every compute path imports ops, so this is the single chokepoint where
# the persistent XLA cache must be configured before the first jit
enable_compilation_cache()

from tomatis_tpu.ops import dsp, gate, stft  # noqa: F401,E402
