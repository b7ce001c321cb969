"""Unit tests for the shared stream-pipelining primitives
(utils/pipeline.py) and the EQ applier's threaded error paths."""
import threading
import time

import numpy as np
import pytest

from tomatis_tpu.utils.pipeline import OrderedWorker, Prefetcher


def test_prefetcher_order_and_end():
    p = Prefetcher(iter(range(7)), depth=2)
    try:
        assert [p.get() for _ in range(7)] == list(range(7))
        with pytest.raises(StopIteration):
            p.get()
        with pytest.raises(StopIteration):   # end is sticky
            p.get()
    finally:
        p.close()


def test_prefetcher_exception_in_order_and_sticky():
    def gen():
        yield 1
        yield 2
        raise ValueError("midstream")

    p = Prefetcher(gen(), depth=2)
    try:
        assert p.get() == 1
        assert p.get() == 2
        with pytest.raises(ValueError, match="midstream"):
            p.get()
        # a retry must raise again, not deadlock on the dead producer
        with pytest.raises(ValueError, match="midstream"):
            p.get()
    finally:
        p.close()


def test_prefetcher_close_unblocks_full_queue():
    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield i

    p = Prefetcher(gen(), depth=2)
    assert p.get() == 0
    p.close()    # producer blocked on a full queue must exit promptly
    assert not p._thread.is_alive()
    assert len(produced) < 100   # it stopped early


def test_ordered_worker_runs_in_order():
    w = OrderedWorker()
    seen = []
    try:
        for i in range(20):
            w.submit(lambda i=i: seen.append(i))
        w.check(join=True)
        assert seen == list(range(20))
    finally:
        w.close()


def test_ordered_worker_error_skips_later_jobs():
    w = OrderedWorker()
    ran = []
    w.submit(lambda: ran.append("a"))
    w.submit(lambda: (_ for _ in ()).throw(RuntimeError("job failed")))
    # the error surfaces at a later submit or check; later jobs are skipped
    with pytest.raises(RuntimeError, match="job failed"):
        w.submit(lambda: ran.append("b"))
        w.check(join=True)
    with pytest.raises(RuntimeError, match="job failed"):
        w.check()
    w.close()
    assert ran == ["a"]


def test_apply_eq_progress_error_propagates(tmp_path):
    """A failing progress callback on the worker thread must fail
    apply_gain_stream itself and leave no helper threads behind."""
    from tomatis_tpu.io import audio
    from tomatis_tpu.models.eq import apply_gain_stream

    sr = 48000
    t = np.arange(int(1.5 * sr)) / sr
    x = (0.05 * np.sin(2 * np.pi * 500 * t)).astype(np.float32)
    ip = tmp_path / "in.wav"
    audio.write(ip, np.stack([x, x], 1), sr, subtype="PCM_24")
    gain = np.ones(4096 // 2 + 1, np.float32)

    baseline = threading.active_count()

    def bad_progress(done, total):
        raise RuntimeError("progress exploded")

    with pytest.raises(RuntimeError, match="progress exploded"):
        apply_gain_stream(ip, tmp_path / "out.wav", gain,
                          frames_per_chunk=8, progress=bad_progress)
    deadline = time.time() + 6.0
    while time.time() < deadline and threading.active_count() > baseline:
        time.sleep(0.05)
    assert threading.active_count() <= baseline, threading.enumerate()


def test_stage_encode_to_device_contract():
    """The tagged staging items and their stats accounting."""
    from tomatis_tpu.engine.streaming import stage_encode, stage_to_device

    n, ch = 512, 2
    exact = (np.arange(n * ch, dtype=np.float32).reshape(n, ch)
             / 8388608.0)
    inexact = exact + np.float32(1e-9)
    ints = np.arange(n * ch, dtype=np.int32).reshape(n, ch) - 500

    stats = {"in_bytes": 0, "in_raw_chunks": 0}
    kind, _ = stage_encode(exact, int_in=False)
    assert kind == "wire"
    kind, val = stage_encode(inexact, int_in=False)
    assert kind == "raw_inexact"
    out = stage_to_device((kind, val), n, ch, stats)
    assert out is val and stats["in_raw_chunks"] == 1

    kind, val = stage_encode(ints, int_in=True)
    assert kind == "wire"
    dev = stage_to_device((kind, val), n, ch, stats)
    assert stats["in_bytes"] == len(val) > 0
    np.testing.assert_array_equal(
        np.rint(np.asarray(dev) * 8388608.0).astype(np.int32), ints)

    # wire_input=False bypasses encoding entirely
    kind, val = stage_encode(exact, int_in=False, wire_input=False)
    assert kind == "raw" and val is exact
