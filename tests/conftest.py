"""Test configuration: run JAX on CPU with 8 virtual devices so sharding
tests work without TPU hardware.

The image's sitecustomize force-registers the 'axon' TPU platform and
rewrites jax_platforms to 'axon,cpu', so setting the env var alone is not
enough — override the config after import too.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# keep CPU-test compile-cache entries OUT of the repo-local .xla_cache:
# that directory is committed with real-TPU entries so the bench driver
# starts primed (r03 paid a 4-minute cold warmup), and test runs would
# bloat it with CPU executables
os.environ.setdefault(
    "TOMATIS_COMPILE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "tomatis_tpu",
                 "xla_cache_cputest"))
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, jax.devices()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-stage end-to-end workflow tests")
