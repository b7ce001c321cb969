"""Batch processing: vmapped lanes must match single-file outputs exactly;
per-file failures stay isolated."""
import numpy as np

from tomatis_tpu.io import audio
from tomatis_tpu.models.standard import StandardParams, process
from tomatis_tpu.parallel.batch import process_batch

SR = 48000


def _sig(seconds, seed, quiet=0.002, loud=0.06):
    rng = np.random.default_rng(seed)
    n = int(seconds * SR)
    t = np.arange(n) / SR
    env = quiet + loud * (np.sin(2 * np.pi * (0.5 + 0.1 * seed) * t) > 0)
    x = env * (np.sin(2 * np.pi * (300 + 50 * seed) * t)
               + 0.05 * rng.standard_normal(n))
    return np.clip(np.stack([x, 0.9 * x], 1), -1, 1).astype(np.float32)


def test_batch_matches_single(tmp_path):
    p = StandardParams(require_48k_stereo=False)
    jobs = []
    for i, sec in enumerate([3.0, 2.2, 4.1]):  # unequal lengths
        ip = tmp_path / f"in{i}.flac"
        audio.write(ip, _sig(sec, i), SR, subtype="PCM_24")
        jobs.append((ip, tmp_path / f"out{i}.flac"))
    csvs = [tmp_path / f"st{i}.csv" for i in range(3)]
    stats = process_batch(jobs, p, frames_per_chunk=16,
                          state_csv_paths=csvs)
    assert all(s["failed"] is None for s in stats)

    for i, (ip, op) in enumerate(jobs):
        ref_o = tmp_path / f"ref{i}.flac"
        ref_c = tmp_path / f"refst{i}.csv"
        process(ip, ref_o, p, state_csv_path=ref_c, frames_per_chunk=16)
        y_ref, _ = audio.read(ref_o)
        y_bat, _ = audio.read(op)
        np.testing.assert_array_equal(y_bat, y_ref)
        assert open(csvs[i]).read() == open(ref_c).read()


def test_batch_sharded_over_device_mesh(tmp_path):
    """devices=N shards the lane axis over a 1-D mesh (BASELINE config 5:
    files across chips); outputs must stay byte-identical to the
    single-device path, including with lane-count padding (3 files on 4
    devices -> one idle lane)."""
    p = StandardParams(require_48k_stereo=False)
    jobs = []
    for i, sec in enumerate([2.0, 1.4, 2.6]):
        ip = tmp_path / f"in{i}.flac"
        audio.write(ip, _sig(sec, 10 + i), SR, subtype="PCM_24")
        jobs.append((ip, tmp_path / f"out{i}.flac"))
    stats = process_batch(jobs, p, frames_per_chunk=16, devices=4)
    assert all(s["failed"] is None for s in stats)
    for i, (ip, op) in enumerate(jobs):
        ref_o = tmp_path / f"ref{i}.flac"
        process(ip, ref_o, p, frames_per_chunk=16)
        y_ref, _ = audio.read(ref_o)
        y_bat, _ = audio.read(op)
        np.testing.assert_array_equal(y_bat, y_ref)


def test_batch_isolates_failures(tmp_path):
    p = StandardParams(require_48k_stereo=False)
    good = tmp_path / "good.flac"
    audio.write(good, _sig(2.0, 1), SR, subtype="PCM_24")
    bad = tmp_path / "missing.flac"          # doesn't exist
    corrupt = tmp_path / "corrupt.flac"
    corrupt.write_bytes(b"not a flac file at all")
    jobs = [(bad, tmp_path / "o0.flac"),
            (good, tmp_path / "o1.flac"),
            (corrupt, tmp_path / "o2.flac")]
    stats = process_batch(jobs, p, frames_per_chunk=16)
    assert stats[0]["failed"] is not None
    assert stats[2]["failed"] is not None
    assert stats[1]["failed"] is None
    y, _ = audio.read(tmp_path / "o1.flac")
    assert len(y) == int(2.0 * SR)


def test_batch_rejects_rate_mismatch_per_file(tmp_path):
    p = StandardParams()  # strict 48k stereo
    a = tmp_path / "a.flac"
    b = tmp_path / "b.flac"
    audio.write(a, _sig(1.5, 2), SR, subtype="PCM_24")
    audio.write(b, _sig(1.0, 3)[:, :1], SR, subtype="PCM_24")  # mono
    stats = process_batch([(a, tmp_path / "oa.flac"),
                           (b, tmp_path / "ob.flac")], p,
                          frames_per_chunk=16)
    assert stats[0]["failed"] is None
    assert "stereo" in stats[1]["failed"] or "48" in stats[1]["failed"]


def test_all_files_unopenable_returns_failed_stats(tmp_path):
    """If every input fails to open, per-file failure isolation must hold:
    failed stats come back, no engine crash (round-1 advisory finding)."""
    from tomatis_tpu.models.standard import StandardParams
    from tomatis_tpu.parallel.batch import process_batch
    jobs = [(tmp_path / "nope1.flac", tmp_path / "o1.flac"),
            (tmp_path / "nope2.flac", tmp_path / "o2.flac")]
    stats = process_batch(jobs, StandardParams(require_48k_stereo=False))
    assert len(stats) == 2
    assert all(s["failed"] is not None for s in stats)
    assert all(s["n_frames"] == 0 for s in stats)
