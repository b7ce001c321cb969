"""Host-side I/O must never initialize the JAX backend.

On the production host the default backend is a tunneled TPU whose
attach can take minutes when the link is busy; analysis/verification
tools that only read audio files must not pay (or contend for) it.
Regression for the module-level jnp constant that made `import
tomatis_tpu.ops` attach the backend (ops/gate.py _BIG).
"""
import os
import subprocess
import sys

import numpy as np

from tomatis_tpu.io import audio

_CHECK = """
import sys
sys.path.insert(0, {repo!r})
from tomatis_tpu.io import audio
x, _ = audio.read({path!r})
assert x.shape == (1000, 2), x.shape
f = audio.AudioFile({path!r}, "r")
v = f.read_int24(100)
assert v.dtype.name == "int32"
f.close()
# the numpy-only byte converters must come from utils.pcm, jax-free
from tomatis_tpu.utils import pcm
assert pcm.i32_from_le24(pcm.le24_from_i32(
    __import__("numpy").arange(-5, 5))).tolist() == list(range(-5, 5))
import jax._src.xla_bridge as xb
assert not xb._backends, "reading a WAV initialized the JAX backend!"
print("LIGHT-OK")
"""


_PIN = """
import os, sys
sys.path.insert(0, {repo!r})
os.environ["TOMATIS_PLATFORM"] = "cpu"
from tomatis_tpu.cli.main import _pin_platform
_pin_platform()
import jax
assert jax.devices()[0].platform == "cpu", jax.devices()
print("PIN-OK")
"""


def test_tomatis_platform_env_pins_backend():
    """TOMATIS_PLATFORM=cpu must win even where a host plugin overrode
    jax's platform config at interpreter start (JAX_PLATFORMS alone is
    ignored there)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run([sys.executable, "-c", _PIN.format(repo=repo)],
                       capture_output=True, text=True, timeout=120, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "PIN-OK" in r.stdout


def test_wav_read_does_not_initialize_backend(tmp_path):
    p = str(tmp_path / "a.wav")
    rng = np.random.default_rng(0)
    audio.write(p, (rng.standard_normal((1000, 2)) * 0.1).astype(np.float32),
                48000, subtype="PCM_24")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # fresh interpreter WITHOUT the test suite's cpu pinning: the point is
    # that no backend (of any platform) gets initialized by file I/O
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, "-c", _CHECK.format(repo=repo, path=p)],
        capture_output=True, text=True, timeout=120, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "LIGHT-OK" in r.stdout
