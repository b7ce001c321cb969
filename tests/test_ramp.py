"""Chunk ramp-up: streams longer than 2 chunks start with two smaller
chunks (F/4, F/2) to fill the host<->device pipeline faster. The chunk
size is a pure function of the absolute frame cursor, so outputs stay
within engine tolerance of the oracle and checkpoint resume reproduces
the uninterrupted run byte for byte."""
import numpy as np
import pytest

from tests.oracle import refdsp
from tomatis_tpu.io import audio
from tomatis_tpu.models.standard import (StandardParams, make_runner,
                                         process, process_array)

SR = 48000
P = StandardParams(gate_ui=50.0, hysteresis_db=3.0, up_delay_ms=250.0,
                   require_48k_stereo=False)


def _signal(seconds, seed=3):
    rng = np.random.default_rng(seed)
    n = int(seconds * SR)
    t = np.arange(n) / SR
    env = 0.004 + 0.2 * (np.sin(2 * np.pi * 0.45 * t) > 0)
    x = env * (np.sin(2 * np.pi * 500 * t)
               + 0.4 * np.sin(2 * np.pi * 3000 * t)
               + 0.02 * rng.standard_normal(n))
    return np.clip(np.stack([x, 0.9 * x], 1), -1, 1).astype(np.float32)


def test_ramp_engages_and_matches_oracle():
    x = _signal(23.0)
    runner = make_runner(P, SR, 2, len(x), frames_per_chunk=256)
    assert runner._ramp, "23 s at fpc=256 must engage the ramp"
    assert runner._chunk_F(0) == 64
    assert runner._chunk_F(64) == 128
    assert runner._chunk_F(192) == 256
    y, stats = process_array(x, SR, P, frames_per_chunk=256)
    y_ref, states_ref, _ = refdsp.process_standard_loop(x, SR)
    assert y.shape == y_ref.shape
    assert np.max(np.abs(y - y_ref)) < 2e-4
    assert stats["c2_frames"] == int(np.sum(states_ref == 2))


def test_ramp_disabled_for_short_streams():
    runner = make_runner(P, SR, 2, 4 * SR, frames_per_chunk=256)
    assert not runner._ramp   # ~95 frames < 2 chunks: no extra executables
    assert runner._chunk_F(0) == 256


class _Bomb(Exception):
    pass


def test_ramp_resume_byte_identical(tmp_path, monkeypatch):
    """Interrupt a ramped run right after its first flush write and
    resume: the pure-function chunk schedule must reproduce the
    uninterrupted run's chunk boundaries, so the resumed file is
    byte-identical."""
    x = _signal(23.0, seed=9)
    ip = tmp_path / "in.wav"
    audio.write(ip, x, SR, subtype="PCM_24")

    ref = tmp_path / "ref.wav"
    process(ip, ref, P, frames_per_chunk=256,
            state_csv_path=tmp_path / "ref.csv")

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
        process(ip, out, P, frames_per_chunk=256, checkpoint_path=ck,
                checkpoint_every=2, state_csv_path=tmp_path / "out.csv")
    monkeypatch.setattr(S.StreamRunner, "_write_cut_pcm24", orig)
    assert ck.exists()
    process(ip, out, P, frames_per_chunk=256, checkpoint_path=ck,
            checkpoint_every=2, state_csv_path=tmp_path / "out.csv")
    assert not ck.exists()
    assert (out.read_bytes() == ref.read_bytes()), \
        "resumed ramped run diverged from the uninterrupted run"
    assert ((tmp_path / "out.csv").read_bytes()
            == (tmp_path / "ref.csv").read_bytes())


def test_no_ramp_env_disables_schedule(monkeypatch):
    """TOMATIS_NO_RAMP=1 (the bench's setting: each extra chunk shape is
    an executable compile-or-load over the device link) flattens the
    schedule to one chunk shape; output stays within engine tolerance."""
    monkeypatch.setenv("TOMATIS_NO_RAMP", "1")
    x = _signal(23.0, seed=5)
    runner = make_runner(P, SR, 2, len(x), frames_per_chunk=256)
    assert not runner._ramp
    assert runner._chunk_F(0) == 256
    assert len(runner._by_F) == 1, "no extra executables may be built"
    y, _ = process_array(x, SR, P, frames_per_chunk=256)
    y_ref, _, _ = refdsp.process_standard_loop(x, SR)
    assert y.shape == y_ref.shape
    assert np.max(np.abs(y - y_ref)) < 2e-4


def test_no_ramp_checkpoint_not_resumable_with_ramp(tmp_path, monkeypatch):
    """The chunk schedule decides float summation order, so a checkpoint
    taken under TOMATIS_NO_RAMP must refuse to resume with the ramp back
    on (fingerprint carries the flag)."""
    monkeypatch.setenv("TOMATIS_NO_RAMP", "1")
    x = _signal(23.0, seed=11)
    ip = tmp_path / "in.wav"
    audio.write(ip, x, SR, subtype="PCM_24")
    out = tmp_path / "out.wav"
    ck = tmp_path / "ck.npz"
    from tomatis_tpu.engine import streaming as S
    orig = S.StreamRunner._write_cut_pcm24
    calls = {"n": 0}

    def bomb(self, *a, **k):
        calls["n"] += 1
        # flat 256-frame chunks flush ~2 cuts per chunk: die on the
        # first write AFTER the chunk-1 snapshot (cut 3)
        if calls["n"] > 2:
            raise _Bomb()
        return orig(self, *a, **k)

    monkeypatch.setattr(S.StreamRunner, "_write_cut_pcm24", bomb)
    with pytest.raises(_Bomb):
        process(ip, out, P, frames_per_chunk=256, checkpoint_path=ck,
                checkpoint_every=1)
    monkeypatch.setattr(S.StreamRunner, "_write_cut_pcm24", orig)
    assert ck.exists()
    # flipping the schedule must not resume the no-ramp checkpoint:
    # the manager refuses config-incompatible state outright
    monkeypatch.delenv("TOMATIS_NO_RAMP")
    with pytest.raises(ValueError, match="different parameters"):
        process(ip, out, P, frames_per_chunk=256, checkpoint_path=ck,
                checkpoint_every=1)
    # same env as the checkpoint: resumes and completes
    monkeypatch.setenv("TOMATIS_NO_RAMP", "1")
    process(ip, out, P, frames_per_chunk=256, checkpoint_path=ck,
            checkpoint_every=1)
    assert not ck.exists()
    # byte-identical to a clean no-ramp run (resume spliced correctly)
    ref = tmp_path / "ref.wav"
    process(ip, ref, P, frames_per_chunk=256)
    assert out.read_bytes() == ref.read_bytes()
