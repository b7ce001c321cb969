"""Process-based input staging (engine/staging.py): the file read + wire
encode of upcoming chunks runs in a persistent worker process (the dev
host's device-link waits do not reliably yield to threads). These tests
pin: byte-identity with the in-process thread producer, worker reuse
across runs, checkpoint resume through the worker, concurrent streams,
and clean failure when the worker dies mid-stream."""
import os

import numpy as np
import pytest

from tests.test_ramp import _signal
from tomatis_tpu.engine import staging
from tomatis_tpu.io import audio
from tomatis_tpu.models.standard import StandardParams, process

SR = 48000
P = StandardParams(gate_ui=50.0, hysteresis_db=3.0, up_delay_ms=250.0,
                   require_48k_stereo=False)
# > 8 chunks at fpc=64 (the engagement threshold) while staying small
# enough for the CPU backend: 30 s = ~700 frames = 11 chunks
FPC = 64


@pytest.fixture()
def infile(tmp_path):
    ip = tmp_path / "in.wav"
    audio.write(ip, _signal(30.0, seed=21), SR, subtype="PCM_24")
    return ip


def test_process_staging_matches_thread_path(infile, tmp_path, monkeypatch):
    monkeypatch.setenv("TOMATIS_PROCESS_STAGE", "0")
    ref = tmp_path / "ref.wav"
    process(infile, ref, P, frames_per_chunk=FPC,
            state_csv_path=tmp_path / "ref.csv")

    monkeypatch.setenv("TOMATIS_PROCESS_STAGE", "1")
    out = tmp_path / "out.wav"
    process(infile, out, P, frames_per_chunk=FPC,
            state_csv_path=tmp_path / "out.csv")
    assert out.read_bytes() == ref.read_bytes()
    assert (tmp_path / "out.csv").read_bytes() \
        == (tmp_path / "ref.csv").read_bytes()

    # the singleton worker survives the run and is reused by the next
    assert staging._WORKER and staging._WORKER[0].alive()
    w0 = staging._WORKER[0]
    out2 = tmp_path / "out2.wav"
    process(infile, out2, P, frames_per_chunk=FPC)
    assert out2.read_bytes() == ref.read_bytes()
    assert staging._WORKER and staging._WORKER[0] is w0


class _Bomb(Exception):
    pass


def test_process_staging_resume_byte_identical(infile, tmp_path,
                                               monkeypatch):
    """Interrupt a process-staged checkpointed run and resume: the
    worker's schedule restarts at the resume frame and the spliced
    output is byte-identical to an uninterrupted run."""
    monkeypatch.setenv("TOMATIS_PROCESS_STAGE", "1")
    ref = tmp_path / "ref.wav"
    process(infile, ref, P, frames_per_chunk=FPC)

    out = tmp_path / "out.wav"
    ck = tmp_path / "ck.npz"
    from tomatis_tpu.engine import streaming as S
    orig = S.StreamRunner._write_cut_pcm24
    calls = {"n": 0}

    def bomb(self, *a, **k):
        calls["n"] += 1
        if calls["n"] > 1:
            raise _Bomb()
        return orig(self, *a, **k)

    monkeypatch.setattr(S.StreamRunner, "_write_cut_pcm24", bomb)
    with pytest.raises(_Bomb):
        process(infile, out, P, frames_per_chunk=FPC, checkpoint_path=ck,
                checkpoint_every=2)
    monkeypatch.setattr(S.StreamRunner, "_write_cut_pcm24", orig)
    assert ck.exists()
    process(infile, out, P, frames_per_chunk=FPC, checkpoint_path=ck,
            checkpoint_every=2)
    assert not ck.exists()
    assert out.read_bytes() == ref.read_bytes()


def test_concurrent_streams_use_dedicated_workers(infile, tmp_path,
                                                  monkeypatch):
    """Two overlapping staged streams must not cross pipes: the second
    gets a throwaway worker while the first holds the singleton."""
    monkeypatch.setenv("TOMATIS_PROCESS_STAGE", "1")
    import threading
    outs = [tmp_path / "a.wav", tmp_path / "b.wav"]
    errs = []

    def run(o):
        try:
            process(infile, o, P, frames_per_chunk=FPC)
        except BaseException as e:  # noqa: BLE001
            errs.append(e)
    ths = [threading.Thread(target=run, args=(o,)) for o in outs]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    assert not errs
    assert outs[0].read_bytes() == outs[1].read_bytes()


def test_worker_death_fails_loudly(infile, tmp_path, monkeypatch):
    """A worker killed mid-stream must surface as a run error (never
    silent truncation), and the next run must respawn cleanly."""
    monkeypatch.setenv("TOMATIS_PROCESS_STAGE", "1")
    from tomatis_tpu.engine import streaming as S

    real_stage = staging.stage_stream
    holder = {}

    def capture(*a, **k):
        st = real_stage(*a, **k)
        holder["stream"] = st
        st._w.kill()   # die before the first item arrives
        return st

    monkeypatch.setattr(S.staging, "stage_stream", capture)
    out = tmp_path / "out.wav"
    with pytest.raises(RuntimeError, match="staging worker"):
        process(infile, out, P, frames_per_chunk=FPC)
    monkeypatch.setattr(S.staging, "stage_stream", real_stage)

    ref = tmp_path / "ref.wav"
    process(infile, ref, P, frames_per_chunk=FPC)   # clean respawn
    monkeypatch.setenv("TOMATIS_PROCESS_STAGE", "0")
    thr = tmp_path / "thr.wav"
    process(infile, thr, P, frames_per_chunk=FPC)
    assert ref.read_bytes() == thr.read_bytes()


def test_decode_offload_matches_local_and_falls_back():
    """decode_pcm24 through the RPC worker is byte-identical to the
    local decoder, and a killed worker degrades to local decode."""
    from tomatis_tpu.io import wirecodec
    rng = np.random.default_rng(5)
    v = (rng.standard_normal((48000, 2)) * 3e5).astype(np.int32)
    enc = wirecodec.encode_i32(v, rice=True)
    buf = np.asarray(enc, np.uint8) if not isinstance(enc, np.ndarray) \
        else enc
    local = wirecodec.decode_pcm24(buf, len(v), 2)

    staging.ensure_rpc_worker()
    assert staging._RPC and staging._RPC[0].alive()
    off = staging.decode_pcm24_offload(buf, len(v), 2)
    assert np.array_equal(off, local)

    staging._RPC[0].kill()   # dead worker: silent local fallback
    off2 = staging.decode_pcm24_offload(buf, len(v), 2)
    assert np.array_equal(off2, local)


def test_batch_rpc_encode_matches_local(tmp_path, monkeypatch):
    """With the RPC worker up, batch lane encodes route through it and
    the outputs stay byte-identical to the local-encode batch."""
    from tomatis_tpu.models.standard import process as std_process
    from tomatis_tpu.parallel.batch import process_batch
    jobs_a, jobs_b = [], []
    for i in range(2):
        x = _signal(6.0, seed=60 + i)
        ip = tmp_path / f"b{i}.wav"
        audio.write(ip, x, SR, subtype="PCM_24")
        jobs_a.append((ip, tmp_path / f"a{i}_out.wav"))
        jobs_b.append((ip, tmp_path / f"b{i}_out.wav"))

    # local path first (no worker)
    for w in list(staging._RPC):
        w.kill()
    staging._RPC.clear()
    process_batch(jobs_a, P, frames_per_chunk=FPC)

    staging.ensure_rpc_worker()
    assert staging.rpc_available()
    process_batch(jobs_b, P, frames_per_chunk=FPC)
    for (_, oa), (_, ob) in zip(jobs_a, jobs_b):
        assert oa.read_bytes() == ob.read_bytes()
