"""Stream-driver threading: error propagation and clean shutdown.

The engine's stream driver runs a producer thread (input read + wire
encode) and an ordered consumer thread (decode + drain + write); an
exception on either side must surface from run() on the caller's thread
and leave no live helper threads behind.
"""
import threading
import time

import numpy as np
import pytest

from tomatis_tpu.engine.streaming import ChunkedStftEngine, StreamRunner
from tomatis_tpu.models.standard import StandardParams, build_controller

SR = 48000


def _sig(seconds=2.0):
    t = np.arange(int(seconds * SR)) / SR
    x = 0.05 * np.sin(2 * np.pi * 700 * t)
    return np.stack([x, 0.9 * x], 1).astype(np.float32)


def _runner(total, transport="f32"):
    p = StandardParams(require_48k_stereo=False)
    eng = ChunkedStftEngine(p.n_fft, p.hop, 2, frames_per_chunk=8)
    return StreamRunner(eng, build_controller(p, SR), total,
                        transport=transport)


def _wait_threads_settle(baseline, timeout=6.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if threading.active_count() <= baseline:
            return True
        time.sleep(0.05)
    return threading.active_count() <= baseline


def test_consumer_exception_propagates_and_threads_exit():
    """on_audio (file-write stand-in) raising on the consumer thread must
    fail the run itself, not hang it or die silently."""
    sig = _sig(3.0)
    baseline = threading.active_count()
    r = _runner(len(sig))

    calls = []

    def bad_audio(chunk):
        calls.append(len(chunk))
        raise OSError("disk full")

    with pytest.raises(OSError, match="disk full"):
        r.run(sig, on_audio=bad_audio)
    assert calls, "the failing sink was never invoked"
    assert _wait_threads_settle(baseline), \
        f"helper threads leaked: {threading.enumerate()}"


def test_producer_exception_propagates_and_threads_exit():
    """A source whose read() fails mid-stream (producer thread) must
    surface the original exception from run()."""
    class FlakySource:
        """ndarray-like reader: first block ok, then an I/O error."""
        def __init__(self, x):
            self.x = x
            self.pos = 0
            self.reads = 0

        def read(self, n):
            self.reads += 1
            if self.reads > 1:
                raise IOError("stream went away")
            blk = self.x[self.pos:self.pos + n]
            self.pos += len(blk)
            return blk

    sig = _sig(4.0)
    baseline = threading.active_count()
    r = _runner(len(sig))

    class _Src:
        read = FlakySource(sig).read
    with pytest.raises(IOError, match="stream went away"):
        r.run(_Src(), on_audio=lambda c: None)
    assert _wait_threads_settle(baseline), \
        f"helper threads leaked: {threading.enumerate()}"


def test_run_after_failure_is_reusable():
    """A failed run must not poison module state: a fresh runner over the
    same engine must still produce correct output."""
    sig = _sig(2.0)
    r = _runner(len(sig))
    with pytest.raises(RuntimeError):
        r.run(sig, on_audio=lambda c: (_ for _ in ()).throw(
            RuntimeError("boom")))

    r2 = _runner(len(sig))
    outs = []
    stats = r2.run(sig, on_audio=outs.append)
    y = np.concatenate([o.reshape(-1, 2) for o in outs])
    assert len(y) == len(sig)
    assert stats["n_frames"] > 0


def test_engine_rejects_log_keys_rebinding():
    """One engine serves one controller type: the aux unpack layout
    follows LOG_KEYS, so rebinding must fail loudly (it used to silently
    misalign the rows)."""
    from tomatis_tpu.engine.streaming import ChunkedStftEngine
    from tomatis_tpu.models.controllers import StaticGainController
    from tomatis_tpu.models.standard import StandardParams, build_controller

    p = StandardParams(require_48k_stereo=False)
    eng = ChunkedStftEngine(p.n_fft, p.hop, 2, frames_per_chunk=8)
    eng.make_chunk_fn(build_controller(p, SR))          # LOG_KEYS=('states',)
    gains = np.ones(p.n_fft // 2 + 1, np.float32)
    with pytest.raises(ValueError, match="LOG_KEYS"):
        eng.make_chunk_fn(StaticGainController(gains))  # LOG_KEYS=()
