"""Checkpoint/resume: interrupt a processing run mid-stream and verify the
resumed output is identical to an uninterrupted run."""
import numpy as np
import pytest

from tomatis_tpu.io import audio
from tomatis_tpu.models.standard import StandardParams, process


def _signal(seconds=8.0, sr=48000, seed=17):
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    env = 0.002 + 0.05 * (np.sin(2 * np.pi * 0.7 * t) > 0)
    x = env * (np.sin(2 * np.pi * 500 * t)
               + 0.02 * rng.standard_normal(n))
    return np.clip(np.stack([x, 0.9 * x], 1), -1, 1).astype(np.float32)


class _Bomb(Exception):
    pass


def test_resume_after_interrupt(tmp_path, monkeypatch):
    sr = 48000
    x = _signal()
    ip = tmp_path / "in.flac"
    audio.write(ip, x, sr, subtype="PCM_24")
    p = StandardParams(require_48k_stereo=False)

    ref = tmp_path / "ref.flac"
    process(ip, ref, p, state_csv_path=tmp_path / "ref.csv",
            frames_per_chunk=16)

    out = tmp_path / "out.flac"
    ck = tmp_path / "ck.npz"

    # interrupt: blow up after N audio writes
    from tomatis_tpu.engine import streaming as S
    orig_write = S.StreamRunner._write_cut_pcm24
    calls = {"n": 0}

    def bomb(self, *a, **k):
        calls["n"] += 1
        if calls["n"] > 1:  # 8 s audio has two flush cuts; die on the last
            raise _Bomb()
        return orig_write(self, *a, **k)

    monkeypatch.setattr(S.StreamRunner, "_write_cut_pcm24", bomb)
    with pytest.raises(_Bomb):
        process(ip, out, p, state_csv_path=tmp_path / "out.csv",
                frames_per_chunk=16, checkpoint_path=ck,
                checkpoint_every=4)
    monkeypatch.setattr(S.StreamRunner, "_write_cut_pcm24", orig_write)
    assert ck.exists()

    # resume and complete
    process(ip, out, p, state_csv_path=tmp_path / "out.csv",
            frames_per_chunk=16, checkpoint_path=ck, checkpoint_every=4)
    assert not ck.exists()  # cleared on success

    y_ref, _ = audio.read(ref)
    y_out, _ = audio.read(out)
    np.testing.assert_array_equal(y_out, y_ref)
    ref_csv = open(tmp_path / "ref.csv").read()
    out_csv = open(tmp_path / "out.csv").read()
    assert out_csv == ref_csv


def test_eq_applier_resume_after_interrupt(tmp_path, monkeypatch):
    """apply_eq with checkpoint_path: kill it mid-stream, rerun, and the
    output must equal an uninterrupted run (FLAC output -> staged WAV)."""
    sr = 48000
    x = _signal(8.0)
    ip = tmp_path / "in.flac"
    audio.write(ip, x, sr, subtype="PCM_24")
    eq_csv = tmp_path / "eq.csv"
    eq_csv.write_text("freq_hz,delta_db_raw,delta_db_smooth\n"
                      "100,0,2.0\n1000,0,0.0\n8000,0,-3.0\n16000,0,-3.0\n")

    from tomatis_tpu.models import eq as eqm
    ref = tmp_path / "ref.flac"
    eqm.apply_eq(ip, ref, eq_csv, frames_per_chunk=16)

    out = tmp_path / "out.flac"
    ck = tmp_path / "ck.npz"
    from tomatis_tpu.models.standard import _RawWav
    orig_write = _RawWav.write_raw
    calls = {"n": 0}

    def bomb(self, raw):
        calls["n"] += 1
        if calls["n"] > 6:
            raise _Bomb()
        return orig_write(self, raw)

    monkeypatch.setattr(_RawWav, "write_raw", bomb)
    with pytest.raises(_Bomb):
        eqm.apply_eq(ip, out, eq_csv, frames_per_chunk=16,
                     checkpoint_path=ck, checkpoint_every=2)
    monkeypatch.setattr(_RawWav, "write_raw", orig_write)
    assert ck.exists()

    res = eqm.apply_eq(ip, out, eq_csv, frames_per_chunk=16,
                       checkpoint_path=ck, checkpoint_every=2)
    assert not ck.exists()
    y_ref, _ = audio.read(ref)
    y_out, _ = audio.read(out)
    np.testing.assert_array_equal(y_out, y_ref)
    assert res["peak_seen"] > 0


def test_checkpoint_rejects_changed_config(tmp_path, monkeypatch):
    sr = 48000
    x = _signal(4.0)
    ip = tmp_path / "in.flac"
    audio.write(ip, x, sr, subtype="PCM_24")
    ck = tmp_path / "ck.npz"
    p = StandardParams(require_48k_stereo=False)

    from tomatis_tpu.engine import streaming as S
    orig = S.StreamRunner._write_cut_pcm24
    calls = {"n": 0}

    def bomb(self, *a, **k):
        # 4 s audio has a single (final) flush; die on it
        raise _Bomb()

    monkeypatch.setattr(S.StreamRunner, "_write_cut_pcm24", bomb)
    with pytest.raises(_Bomb):
        process(ip, tmp_path / "o.flac", p, frames_per_chunk=8,
                checkpoint_path=ck, checkpoint_every=2)
    monkeypatch.setattr(S.StreamRunner, "_write_cut_pcm24", orig)
    p2 = StandardParams(require_48k_stereo=False, gate_ui=60.0)
    with pytest.raises(ValueError):
        process(ip, tmp_path / "o.flac", p2, frames_per_chunk=8,
                checkpoint_path=ck, checkpoint_every=2)


def test_xfade_resume(tmp_path, monkeypatch):
    from tomatis_tpu.models.xfade import XfadeParams
    from tomatis_tpu.models.xfade import process as xprocess
    sr = 48000
    x = _signal(7.0)
    ip = tmp_path / "in.flac"
    audio.write(ip, x, sr, subtype="PCM_24")
    p = XfadeParams(xfade_ms=120.0, require_48k_stereo=False)
    ref = tmp_path / "ref.flac"
    xprocess(ip, ref, p, frames_per_chunk=16)

    out, ck = tmp_path / "o.flac", tmp_path / "ck.npz"
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
        xprocess(ip, out, p, frames_per_chunk=16, checkpoint_path=ck,
                 checkpoint_every=4)
    monkeypatch.setattr(S.StreamRunner, "_write_cut_pcm24", orig)
    xprocess(ip, out, p, frames_per_chunk=16, checkpoint_path=ck,
             checkpoint_every=4)
    import numpy as np
    a, _ = audio.read(ref)
    b, _ = audio.read(out)
    np.testing.assert_array_equal(a, b)


def test_checkpoint_rejects_transport_change(tmp_path, monkeypatch):
    """The persisted pending output is PCM bytes under wire/pcm24 but
    float samples under f32 — resuming under a different transport must
    be refused, not silently misinterpreted."""
    sr = 48000
    x = _signal(4.0)
    ip = tmp_path / "in.flac"
    audio.write(ip, x, sr, subtype="PCM_24")
    ck = tmp_path / "ck.npz"
    p = StandardParams(require_48k_stereo=False)

    from tomatis_tpu.engine import streaming as S

    def bomb(self, *a, **k):
        raise _Bomb()

    monkeypatch.setattr(S.StreamRunner, "_write_cut_pcm24", bomb)
    with pytest.raises(_Bomb):
        process(ip, tmp_path / "o.flac", p, frames_per_chunk=8,
                checkpoint_path=ck, checkpoint_every=2, transport="wire")
    monkeypatch.undo()
    with pytest.raises(ValueError, match="different parameters"):
        process(ip, tmp_path / "o.flac", p, frames_per_chunk=8,
                checkpoint_path=ck, checkpoint_every=2, transport="f32")


def test_finalize_degrades_to_wav_without_encoder(tmp_path, monkeypatch):
    """A checkpointed run whose final FLAC transcode cannot encode (no
    g++) must keep the completed audio as a WAV with a hint — the same
    graceful degradation as the uncheckpointed sink open (ref
    src/process_tomatis.py:241-251,471-474) — and still clear the
    checkpoint."""
    sr = 48000
    x = _signal(4.0)
    ip = tmp_path / "in.wav"
    audio.write(ip, x, sr, subtype="PCM_24")
    p = StandardParams(require_48k_stereo=False)

    out = tmp_path / "out.flac"
    ck = tmp_path / "ck.npz"
    # native FLAC encode unavailable only at finalize time: the input is
    # WAV, the stage is WAV, so TOMATIS_NO_NATIVE hits exactly the
    # transcode step (wire encode also degrades, to raw f32 chunks)
    monkeypatch.setenv("TOMATIS_NO_NATIVE", "1")
    from tomatis_tpu.native import build as nb
    nb._CACHE.clear()
    try:
        stats = process(ip, out, p, frames_per_chunk=16,
                        checkpoint_path=ck, checkpoint_every=4)
    finally:
        monkeypatch.delenv("TOMATIS_NO_NATIVE")
        nb._CACHE.clear()
    assert not out.exists()
    assert stats["out_path"] == str(tmp_path / "out.wav")
    assert not ck.exists()
    assert not (tmp_path / "out.flac.part.wav").exists()
    y, rsr = audio.read(stats["out_path"])
    assert rsr == sr and len(y) == len(x)


def test_eq_finalize_degrades_to_wav_without_encoder(tmp_path, monkeypatch):
    """apply_eq with a checkpoint must report the DEGRADED path in its
    result when the final FLAC transcode cannot encode — its gain-protect
    second pass re-reads res['out_path'], which must exist."""
    from tomatis_tpu.models import eq as eqm
    sr = 48000
    x = _signal(3.0)
    ip = tmp_path / "in.wav"
    audio.write(ip, x, sr, subtype="PCM_24")
    csvp = tmp_path / "eq.csv"
    csvp.write_text("freq_hz,delta_db\n100,2\n1000,0\n8000,-3\n")
    out = tmp_path / "out.flac"
    ck = tmp_path / "ck.npz"
    monkeypatch.setenv("TOMATIS_NO_NATIVE", "1")
    from tomatis_tpu.native import build as nb
    nb._CACHE.clear()
    try:
        res = eqm.apply_eq(ip, out, csvp, frames_per_chunk=16,
                           checkpoint_path=ck, checkpoint_every=4)
    finally:
        monkeypatch.delenv("TOMATIS_NO_NATIVE")
        nb._CACHE.clear()
    assert not out.exists()
    assert res["out_path"] == str(tmp_path / "out.wav")
    y, rsr = audio.read(res["out_path"])
    # apply_gain_stream output is uncropped (pad + OLA tail, see test_eq)
    assert rsr == sr and len(y) >= len(x)


def test_finalize_keeps_output_when_stage_cleanup_fails(tmp_path,
                                                        monkeypatch):
    """A cleanup failure AFTER a successful transcode must not destroy
    the just-written output (os.remove used to sit inside the same try
    as the transcode, so its failure took the WAV-degradation path and
    deleted the good file)."""
    import os as _os
    from tomatis_tpu.models import standard as std

    stage = tmp_path / "out.flac.part.wav"
    outp = tmp_path / "out.flac"
    audio.write(stage, _signal(1.0), 48000, subtype="PCM_24")

    class _Ck:
        cleared = False

        def clear(self):
            self.cleared = True

    real_remove = _os.remove

    def deny_remove(path):
        if str(path) == str(stage):
            raise OSError("stage file held open")
        real_remove(path)

    monkeypatch.setattr(std.os if hasattr(std, "os") else _os, "remove",
                        deny_remove)
    ck = _Ck()
    actual = std.finalize_checkpointed_sink(ck, str(stage), str(outp))
    assert actual == str(outp)
    assert outp.exists()          # the good output survived
    assert ck.cleared


def test_sharded_resume_after_interrupt(tmp_path, monkeypatch):
    """process_sharded --checkpoint on the 8-virtual-device CPU mesh:
    kill mid-stream, rerun the same command, output + state CSV must be
    byte-identical to an uninterrupted sharded run (VERDICT r3 item 7)."""
    from tomatis_tpu.parallel.stream import process_sharded

    sr = 48000
    x = _signal(16.0)
    ip = tmp_path / "in.flac"
    audio.write(ip, x, sr, subtype="PCM_24")
    p = StandardParams(require_48k_stereo=False)

    ref = tmp_path / "ref.flac"
    process_sharded(ip, ref, p, frames_per_shard=8,
                    state_csv_path=tmp_path / "ref.csv")

    out = tmp_path / "out.flac"
    ck = tmp_path / "ck.npz"
    from tomatis_tpu.engine import streaming as S
    orig_write = S.StreamRunner._write_cut_f32
    calls = {"n": 0}

    def bomb(self, *a, **k):
        calls["n"] += 1
        if calls["n"] > 1:   # die on the second flush cut
            raise _Bomb()
        return orig_write(self, *a, **k)

    monkeypatch.setattr(S.StreamRunner, "_write_cut_f32", bomb)
    with pytest.raises(_Bomb):
        process_sharded(ip, out, p, frames_per_shard=8,
                        state_csv_path=tmp_path / "out.csv",
                        checkpoint_path=ck, checkpoint_every=1)
    monkeypatch.setattr(S.StreamRunner, "_write_cut_f32", orig_write)
    assert ck.exists()

    stats = process_sharded(ip, out, p, frames_per_shard=8,
                            state_csv_path=tmp_path / "out.csv",
                            checkpoint_path=ck, checkpoint_every=1)
    assert not ck.exists()          # cleared on success
    assert stats["out_path"] == str(out)

    y_ref, _ = audio.read(ref)
    y_out, _ = audio.read(out)
    np.testing.assert_array_equal(y_out, y_ref)
    assert open(tmp_path / "out.csv").read() \
        == open(tmp_path / "ref.csv").read()


def test_sharded_xfade_resume_after_interrupt(tmp_path, monkeypatch):
    """process_sharded --variant xfade --checkpoint: kill mid-stream,
    rerun the same command, output + state CSV (with its alpha column)
    must be byte-identical to an uninterrupted sharded xfade run. The
    xfade variant shares process_sharded's checkpoint path with the
    standard variant, but its carry holds the extra alpha-ramp state —
    this pins that the fingerprint + resume covers it (ADVICE r04)."""
    from tomatis_tpu.models.xfade import XfadeParams
    from tomatis_tpu.parallel.stream import process_sharded

    sr = 48000
    x = _signal(16.0)
    ip = tmp_path / "in.flac"
    audio.write(ip, x, sr, subtype="PCM_24")
    p = XfadeParams(gate_ui=60.0, xfade_ms=120.0,
                    require_48k_stereo=False)

    ref = tmp_path / "ref.flac"
    process_sharded(ip, ref, p, frames_per_shard=8, variant="xfade",
                    state_csv_path=tmp_path / "ref.csv")

    out = tmp_path / "out.flac"
    ck = tmp_path / "ck.npz"
    from tomatis_tpu.engine import streaming as S
    orig_write = S.StreamRunner._write_cut_f32
    calls = {"n": 0}

    def bomb(self, *a, **k):
        calls["n"] += 1
        if calls["n"] > 1:   # die on the second flush cut
            raise _Bomb()
        return orig_write(self, *a, **k)

    monkeypatch.setattr(S.StreamRunner, "_write_cut_f32", bomb)
    with pytest.raises(_Bomb):
        process_sharded(ip, out, p, frames_per_shard=8, variant="xfade",
                        state_csv_path=tmp_path / "out.csv",
                        checkpoint_path=ck, checkpoint_every=1)
    monkeypatch.setattr(S.StreamRunner, "_write_cut_f32", orig_write)
    assert ck.exists()

    stats = process_sharded(ip, out, p, frames_per_shard=8,
                            variant="xfade",
                            state_csv_path=tmp_path / "out.csv",
                            checkpoint_path=ck, checkpoint_every=1)
    assert not ck.exists()          # cleared on success
    assert stats["out_path"] == str(out)

    y_ref, _ = audio.read(ref)
    y_out, _ = audio.read(out)
    np.testing.assert_array_equal(y_out, y_ref)
    assert open(tmp_path / "out.csv").read() \
        == open(tmp_path / "ref.csv").read()


def test_sharded_checkpoint_refuses_other_mesh(tmp_path, monkeypatch):
    """A sharded checkpoint is fingerprinted with the mesh geometry:
    resuming with a different frames_per_shard must be refused (the
    block-scan reassociation differs), not silently produce bytes."""
    from tomatis_tpu.parallel.stream import process_sharded

    sr = 48000
    x = _signal(16.0)
    ip = tmp_path / "in.flac"
    audio.write(ip, x, sr, subtype="PCM_24")
    p = StandardParams(require_48k_stereo=False)
    out = tmp_path / "out.flac"
    ck = tmp_path / "ck.npz"

    from tomatis_tpu.engine import streaming as S
    orig_write = S.StreamRunner._write_cut_f32

    def bomb(self, *a, **k):
        raise _Bomb()

    monkeypatch.setattr(S.StreamRunner, "_write_cut_f32", bomb)
    with pytest.raises(_Bomb):
        process_sharded(ip, out, p, frames_per_shard=8,
                        checkpoint_path=ck, checkpoint_every=1)
    monkeypatch.setattr(S.StreamRunner, "_write_cut_f32", orig_write)
    assert ck.exists()

    with pytest.raises(ValueError, match="different parameters"):
        process_sharded(ip, out, p, frames_per_shard=16,
                        checkpoint_path=ck, checkpoint_every=1)


def test_sharded_adaptive_resume_after_interrupt(tmp_path, monkeypatch):
    """process-sharded --variant adaptive --checkpoint: kill pass 3
    mid-stream, rerun the same command, output + state CSV must be
    byte-identical to an uninterrupted sharded adaptive run."""
    from tomatis_tpu.models import adaptive as A
    from tomatis_tpu.models.adaptive import AdaptiveParams
    from tomatis_tpu.parallel.stream import process_sharded_adaptive

    sr = 48000
    x = _signal(16.0)
    ip = tmp_path / "in.flac"
    audio.write(ip, x, sr, subtype="PCM_24")
    p = AdaptiveParams()

    ref = tmp_path / "ref.flac"
    process_sharded_adaptive(ip, ref, p, frames_per_shard=8,
                             state_csv_path=tmp_path / "ref.csv")

    out = tmp_path / "out.flac"
    ck = tmp_path / "ck.npz"
    orig_emit = A.StageEmitter.emit
    calls = {"n": 0}

    def bomb(self, *a, **k):
        calls["n"] += 1
        if calls["n"] > 2:   # die on the third super-chunk's emission
            raise _Bomb()
        return orig_emit(self, *a, **k)

    monkeypatch.setattr(A.StageEmitter, "emit", bomb)
    with pytest.raises(_Bomb):
        process_sharded_adaptive(ip, out, p, frames_per_shard=8,
                                 state_csv_path=tmp_path / "out.csv",
                                 checkpoint_path=ck, checkpoint_every=1)
    monkeypatch.setattr(A.StageEmitter, "emit", orig_emit)
    assert ck.exists()
    assert (tmp_path / "out.flac.stage.wav").exists()

    stats = process_sharded_adaptive(ip, out, p, frames_per_shard=8,
                                     state_csv_path=tmp_path / "out.csv",
                                     checkpoint_path=ck,
                                     checkpoint_every=1)
    assert not ck.exists()               # cleared on success
    assert not (tmp_path / "out.flac.stage.wav").exists()
    assert stats["out_path"] == str(out)

    y_ref, _ = audio.read(ref)
    y_out, _ = audio.read(out)
    np.testing.assert_array_equal(y_out, y_ref)
    assert open(tmp_path / "out.csv").read() \
        == open(tmp_path / "ref.csv").read()


def test_sharded_adaptive_checkpoint_refuses_other_mesh(tmp_path,
                                                        monkeypatch):
    """The sharded-adaptive checkpoint is fingerprinted with the mesh
    geometry: resuming with a different frames_per_shard must be refused
    (the block-scan reassociation differs), not silently produce bytes."""
    from tomatis_tpu.models import adaptive as A
    from tomatis_tpu.models.adaptive import AdaptiveParams
    from tomatis_tpu.parallel.stream import process_sharded_adaptive

    sr = 48000
    x = _signal(16.0)
    ip = tmp_path / "in.flac"
    audio.write(ip, x, sr, subtype="PCM_24")
    p = AdaptiveParams()
    out = tmp_path / "out.flac"
    ck = tmp_path / "ck.npz"

    orig_emit = A.StageEmitter.emit
    calls = {"n": 0}

    def bomb(self, *a, **k):
        calls["n"] += 1
        if calls["n"] > 2:
            raise _Bomb()
        return orig_emit(self, *a, **k)

    monkeypatch.setattr(A.StageEmitter, "emit", bomb)
    with pytest.raises(_Bomb):
        process_sharded_adaptive(ip, out, p, frames_per_shard=8,
                                 checkpoint_path=ck, checkpoint_every=1)
    monkeypatch.setattr(A.StageEmitter, "emit", orig_emit)
    assert ck.exists()

    with pytest.raises(ValueError, match="different parameters"):
        process_sharded_adaptive(ip, out, p, frames_per_shard=16,
                                 checkpoint_path=ck, checkpoint_every=1)
