"""Sharded (dp x sp) processing vs the single-device path, on the 8-device
virtual CPU mesh set up by conftest.py."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.oracle import refdsp
from tomatis_tpu.ops import dsp, stft
from tomatis_tpu.parallel.sharded import (frame_batch, make_mesh,
                                          sharded_process_step)

SR = 48000
N_FFT, HOP = 1024, 512
TON, TOFF = -38.5, -41.5
DELAY = 2


def _batch(B=4, frames=64, seed=0):
    rng = np.random.default_rng(seed)
    n = (frames - 1) * HOP + N_FFT
    t = np.arange(n) / SR
    sigs = []
    for b in range(B):
        env = np.where(np.sin(2 * np.pi * (0.5 + 0.3 * b) * t + b) > 0,
                       0.3, 0.004)
        x = env * np.sin(2 * np.pi * (400 + 100 * b) * t)
        sigs.append(np.stack([x, 0.9 * x], 1).astype(np.float32))
    return np.stack(sigs)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_single_device():
    mesh = make_mesh(8, data=2)          # 2 x 4
    B, F = 4, 64
    F_loc = F // mesh.shape["seq"]
    sigs = _batch(B, F)
    frames = frame_batch(sigs, N_FFT, HOP, F)

    freqs = stft.rfft_freqs(N_FFT, SR)
    g1 = np.asarray(dsp.db_to_lin(dsp.build_tilt_gain_db(freqs, 1000., 12., 15., -15.)))
    g2 = np.asarray(dsp.db_to_lin(dsp.build_tilt_gain_db(freqs, 1000., 12., -15., 15.)))

    step = sharded_process_step(mesh, N_FFT, HOP, F_loc, 2,
                                TON, TOFF, DELAY, g1, g2)
    s0 = jnp.zeros((B,), jnp.int32)
    n_valid = jnp.full((B,), F, jnp.int32)
    emit, states, carry = step(frames, s0, n_valid)
    emit, states = np.asarray(emit), np.asarray(states)

    win = stft.hann_symmetric(N_FFT)
    for b in range(B):
        frames_b = np.asarray(frames[b]).transpose(0, 2, 1)  # [F, n_fft, C]
        levels = np.array([refdsp.rms_dbfs(
            np.sqrt(np.mean(f.astype(np.float64) ** 2, axis=1)))
            for f in frames_b])
        states_ref = refdsp.gate_updelay_loop(
            levels, TON, TOFF, DELAY * HOP, HOP)
        np.testing.assert_array_equal(states[b], states_ref)
        gains = np.stack([g1, g2])[states_ref - 1]
        y_sum, wsum = refdsp.stft_ola_loop(sigs[b], gains, N_FFT, HOP, win)
        y_ref = y_sum / (wsum[:, None] + 1e-12)
        # rtol covers the stream-head samples where w ~ 0 blows values up
        # (they are trimmed by the pad in real use)
        np.testing.assert_allclose(emit[b], y_ref[:F * HOP],
                                   atol=2e-4, rtol=1e-4)
    # carry is a valid index in [0, DELAY+1]
    assert np.all((np.asarray(carry) >= 0) & (np.asarray(carry) <= DELAY + 1))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_gate_carry_crosses_shards():
    """A C1->C2 run straddling shard boundaries must still honor up-delay."""
    mesh = make_mesh(8, data=1)          # 1 x 8 pure sequence-parallel
    B, F = 1, 64
    F_loc = F // 8
    n = (F - 1) * HOP + N_FFT
    # loud everywhere: switch should happen exactly at frame DELAY
    x = (0.3 * np.sin(2 * np.pi * 800 * np.arange(n) / SR))
    sigs = np.stack([np.stack([x, x], 1).astype(np.float32)])
    frames = frame_batch(sigs, N_FFT, HOP, F)
    freqs = stft.rfft_freqs(N_FFT, SR)
    g1 = np.asarray(dsp.db_to_lin(dsp.build_tilt_gain_db(freqs, 1000., 12., 15., -15.)))
    g2 = np.asarray(dsp.db_to_lin(dsp.build_tilt_gain_db(freqs, 1000., 12., -15., 15.)))
    delay = 37  # crosses several 8-frame shards
    step = sharded_process_step(mesh, N_FFT, HOP, F_loc, 2,
                                TON, TOFF, delay, g1, g2)
    _, states, carry = step(frames, jnp.zeros((B,), jnp.int32),
                            jnp.full((B,), F, jnp.int32))
    states = np.asarray(states)[0]
    assert np.all(states[:delay] == 1)
    assert np.all(states[delay:] == 2)
    assert int(np.asarray(carry)[0]) == delay + 1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_xfade_matches_oracle():
    """Crossfade dp x sp: gate AND alpha ramp block-scans across shards."""
    from tomatis_tpu.parallel.sharded import sharded_xfade_step
    mesh = make_mesh(8, data=1)          # pure sequence-parallel
    B, F = 2, 64
    F_loc = F // 8
    sigs = _batch(B, F, seed=3)
    frames = frame_batch(sigs, N_FFT, HOP, F)
    freqs = stft.rfft_freqs(N_FFT, SR)
    g1_db = np.asarray(dsp.build_tilt_gain_db(freqs, 1000., 12., 9., -9.))
    g2_db = np.asarray(dsp.build_tilt_gain_db(freqs, 1000., 12., -9., 9.))
    xfade_frames = 5
    step = sharded_xfade_step(mesh, N_FFT, HOP, F_loc, 2, TON, TOFF, DELAY,
                              1.0 / xfade_frames, g1_db, g2_db)
    emit, states, alpha, gc, ac = step(
        frames, jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.float32),
        jnp.full((B,), F, jnp.int32))
    emit, states, alpha = map(np.asarray, (emit, states, alpha))

    win = stft.hann_symmetric(N_FFT)
    for b in range(B):
        frames_b = np.asarray(frames[b]).transpose(0, 2, 1)
        levels = np.array([refdsp.rms_dbfs(
            np.sqrt(np.mean(f.astype(np.float64) ** 2, axis=1)))
            for f in frames_b])
        states_ref = refdsp.gate_updelay_loop(levels, TON, TOFF,
                                              DELAY * HOP, HOP)
        np.testing.assert_array_equal(states[b], states_ref)
        alpha_ref = refdsp.alpha_ramp_loop(
            (states_ref == 2).astype(float), 1.0 / xfade_frames)
        np.testing.assert_allclose(alpha[b], alpha_ref, atol=1e-5)
        gains = 10.0 ** (((1 - alpha_ref)[:, None] * g1_db[None, :]
                          + alpha_ref[:, None] * g2_db[None, :]) / 20.0)
        ysum, wsum = refdsp.stft_ola_loop(sigs[b], gains, N_FFT, HOP, win)
        y_ref = ysum / (wsum[:, None] + 1e-12)
        np.testing.assert_allclose(emit[b], y_ref[:F * HOP],
                                   atol=2e-4, rtol=1e-4)
    assert float(np.asarray(ac)[0]) == alpha[0][-1]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_adaptive_matches_oracle():
    """Adaptive dp x sp: min-hold gate block scan + snap-first alpha ramp
    (alpha0 = -1 sentinel) + max(w, 1e-8) normalizer."""
    from tomatis_tpu.parallel.sharded import sharded_adaptive_step
    mesh = make_mesh(8, data=1)          # pure sequence-parallel
    B, F = 2, 64
    F_loc = F // 8
    sigs = _batch(B, F, seed=5)
    frames = frame_batch(sigs, N_FFT, HOP, F)
    freqs = stft.rfft_freqs(N_FFT, SR)
    g1_db = np.asarray(dsp.build_tilt_gain_db(freqs, 1000., 12., 9., -9.))
    g2_db = np.asarray(dsp.build_tilt_gain_db(freqs, 1000., 12., -9., 9.))
    thr, hyst, hold, xfade_frames = -40.0, 3.0, 6, 5
    step = sharded_adaptive_step(mesh, N_FFT, HOP, F_loc, 2,
                                 thr + hyst / 2, thr - hyst / 2, hold,
                                 1.0 / xfade_frames, g1_db, g2_db)
    emit, states, alpha, gc, ac = step(
        frames, jnp.full((B,), hold, jnp.int32),   # carry: h = H (may switch)
        jnp.full((B,), -1.0, jnp.float32),         # snap-first sentinel
        jnp.full((B,), F, jnp.int32))
    emit, states, alpha = map(np.asarray, (emit, states, alpha))

    win = stft.hann_symmetric(N_FFT)
    for b in range(B):
        frames_b = np.asarray(frames[b]).transpose(0, 2, 1)
        levels = np.array([refdsp.rms_dbfs(
            np.sqrt(np.mean(f.astype(np.float64) ** 2, axis=1)))
            for f in frames_b])
        states_ref = refdsp.gate_minhold_loop(levels, thr, hyst, hold)
        np.testing.assert_array_equal(states[b], states_ref)
        targets_ref = (states_ref == 2).astype(float)
        alpha_ref = refdsp.alpha_ramp_loop(targets_ref, 1.0 / xfade_frames,
                                           alpha0=targets_ref[0])
        np.testing.assert_allclose(alpha[b], alpha_ref, atol=1e-5)
        gains = 10.0 ** (((1 - alpha_ref)[:, None] * g1_db[None, :]
                          + alpha_ref[:, None] * g2_db[None, :]) / 20.0)
        ysum, wsum = refdsp.stft_ola_loop(sigs[b], gains, N_FFT, HOP, win)
        y_ref = ysum / np.maximum(wsum[:, None], 1e-8)
        # stream-head samples (w ~ 1e-6) amplify f32-vs-f64 noise; they are
        # trimmed by the pad in real use — loose there, tight elsewhere
        np.testing.assert_allclose(emit[b][:16], y_ref[:16], atol=2e-3)
        np.testing.assert_allclose(emit[b][16:], y_ref[16:F * HOP],
                                   atol=2e-4, rtol=1e-4)


def test_process_sharded_file_matches_single_device(tmp_path):
    """CLI-reachable dp x sp path: file->file output and state CSV must be
    byte-identical to the single-device engine (8-virtual-device mesh)."""
    from tomatis_tpu.io import audio
    from tomatis_tpu.models.standard import StandardParams, process
    from tomatis_tpu.parallel.stream import process_sharded

    rng = np.random.default_rng(5)
    sr = 48000
    t = np.arange(int(7.3 * sr)) / sr
    env = 0.002 + 0.06 * (np.sin(2 * np.pi * 0.4 * t) > 0)
    x = env * (np.sin(2 * np.pi * 800 * t)
               + 0.4 * np.sin(2 * np.pi * 3500 * t)
               + 0.02 * rng.standard_normal(t.size))
    sig = np.stack([x, 0.9 * x], 1).astype(np.float32)
    ip = tmp_path / "in.flac"
    audio.write(ip, sig, sr, subtype="PCM_24")
    p = StandardParams(require_48k_stereo=False, n_fft=1024, hop=512)

    ref = tmp_path / "ref.flac"
    process(ip, ref, p, state_csv_path=tmp_path / "ref.csv",
            frames_per_chunk=64)
    shd = tmp_path / "shd.flac"
    st = process_sharded(ip, shd, p, frames_per_shard=23,
                         state_csv_path=tmp_path / "shd.csv")
    assert st["mesh"] == {"data": 1, "seq": 8}
    y_ref, _ = audio.read(ref)
    y_shd, _ = audio.read(shd)
    np.testing.assert_array_equal(
        np.rint(y_shd * 8388608).astype(np.int32),
        np.rint(y_ref * 8388608).astype(np.int32))
    assert open(tmp_path / "shd.csv").read() == \
        open(tmp_path / "ref.csv").read()
    assert st["c2_frames"] > 0 and st["c1_frames"] > 0


def test_process_sharded_xfade_matches_single_device(tmp_path):
    """The sharded crossfade file path (gate + alpha block scans + tail
    carry) must match the single-device xfade engine byte-for-byte."""
    from tomatis_tpu.io import audio
    from tomatis_tpu.models.xfade import XfadeParams, process
    from tomatis_tpu.parallel.stream import process_sharded

    rng = np.random.default_rng(8)
    sr = 48000
    t = np.arange(int(6.2 * sr)) / sr
    env = 0.002 + 0.06 * (np.sin(2 * np.pi * 0.5 * t) > 0)
    x = env * (np.sin(2 * np.pi * 700 * t)
               + 0.3 * np.sin(2 * np.pi * 3000 * t)
               + 0.02 * rng.standard_normal(t.size))
    sig = np.stack([x, 0.9 * x], 1).astype(np.float32)
    ip = tmp_path / "in.flac"
    audio.write(ip, sig, sr, subtype="PCM_24")
    p = XfadeParams(require_48k_stereo=False, n_fft=1024, hop=512,
                    gate_offset=-80.0, xfade_ms=120.0)

    ref = tmp_path / "ref.flac"
    process(ip, ref, p, state_csv_path=tmp_path / "ref.csv",
            frames_per_chunk=64)
    shd = tmp_path / "shd.flac"
    st = process_sharded(ip, shd, p, frames_per_shard=19,
                         state_csv_path=tmp_path / "shd.csv",
                         variant="xfade")
    assert st["variant"] == "xfade" and st["mesh"]["seq"] == 8
    y_ref, _ = audio.read(ref)
    y_shd, _ = audio.read(shd)
    # the block-composed alpha scan reassociates f32 clip-affine maps, so
    # ramp-frame gains can differ in the last ulp: allow <=1 PCM_24 LSB on
    # a small fraction of samples (states and non-ramp frames are exact)
    d = np.abs(np.rint(y_shd * 8388608).astype(np.int64)
               - np.rint(y_ref * 8388608).astype(np.int64))
    assert d.max() <= 1
    assert (d > 0).mean() < 0.01
    ref_rows = open(tmp_path / "ref.csv").read().splitlines()
    shd_rows = open(tmp_path / "shd.csv").read().splitlines()
    assert len(ref_rows) == len(shd_rows)
    for a, b in zip(ref_rows[1:], shd_rows[1:]):
        ca, cb = a.split(","), b.split(",")
        assert ca[:4] == cb[:4]                     # idx/time/level/state
        assert abs(float(ca[4]) - float(cb[4])) <= 0.001   # alpha %.3f


def test_process_sharded_adaptive_matches_single_device(tmp_path):
    """The CLI-reachable sharded adaptive path (auto threshold + min-hold
    block scan + snap-first alpha + pre-atten/peak-protect passes) must
    match the single-device adaptive processor within 1 PCM_24 LSB (the
    alpha block scan reassociates f32 clip-affine maps), with an
    identical state CSV."""
    from tomatis_tpu.io import audio
    from tomatis_tpu.models.adaptive import AdaptiveParams, process
    from tomatis_tpu.parallel.stream import process_sharded_adaptive

    rng = np.random.default_rng(11)
    sr = 48000
    t = np.arange(int(6.7 * sr)) / sr
    env = 0.002 + 0.06 * (np.sin(2 * np.pi * 0.45 * t) > 0)
    x = env * (np.sin(2 * np.pi * 600 * t)
               + 0.35 * np.sin(2 * np.pi * 2800 * t)
               + 0.02 * rng.standard_normal(t.size))
    sig = np.stack([x, 0.9 * x], 1).astype(np.float32)
    ip = tmp_path / "in.flac"
    audio.write(ip, sig, sr, subtype="PCM_24")
    p = AdaptiveParams(n_fft=1024, hop=512, min_hold_ms=80.0,
                       xfade_ms=120.0)

    ref = tmp_path / "ref.flac"
    ri = process(ip, ref, p, state_csv_path=tmp_path / "ref.csv",
                 frames_per_chunk=64)
    shd = tmp_path / "shd.flac"
    st = process_sharded_adaptive(ip, shd, p, frames_per_shard=21,
                                  state_csv_path=tmp_path / "shd.csv")
    assert st["mesh"]["seq"] == 8 and st["variant"] == "adaptive"
    assert st["optimal_threshold"] == ri["optimal_threshold"]
    assert st["atten_db"] == ri["atten_db"]
    assert st["switch_count"] == ri["switch_count"]
    y_ref, _ = audio.read(ref)
    y_shd, _ = audio.read(shd)
    d = np.abs(np.rint(y_shd * 8388608).astype(np.int64)
               - np.rint(y_ref * 8388608).astype(np.int64))
    assert d.max() <= 1
    assert (d > 0).mean() < 0.01
    assert open(tmp_path / "shd.csv").read() == \
        open(tmp_path / "ref.csv").read()
    assert 0.0 < st["c2_ratio"] < 1.0 and st["switch_count"] > 0


def test_process_sharded_rejects_data_gt_1(tmp_path):
    """data > 1 used to crash deep inside shard_map ('axis sizes not
    evenly divisible'); it must be rejected up front with a clear error."""
    from tomatis_tpu.io import audio
    from tomatis_tpu.models.standard import StandardParams
    from tomatis_tpu.parallel.stream import process_sharded

    sr = 48000
    x = np.zeros((sr // 4, 2), np.float32)
    ip = tmp_path / "in.wav"
    audio.write(ip, x, sr, subtype="PCM_24")
    with pytest.raises(ValueError, match="data must be 1"):
        process_sharded(str(ip), str(tmp_path / "out.wav"),
                        StandardParams(require_48k_stereo=False,
                                       n_fft=256, hop=128),
                        n_devices=4, data=2, frames_per_shard=8)


def test_process_sharded_cli_all_variants(tmp_path, capsys):
    """The process-sharded CLI itself must run every variant (regression:
    the xfade branch referenced an undefined name and crashed before any
    work; the library-level tests above never exercised the CLI)."""
    from tomatis_tpu.cli import process_sharded as ps
    from tomatis_tpu.io import audio

    sr = 48000
    t = np.arange(int(1.5 * sr)) / sr
    env = 0.002 + 0.06 * (np.sin(2 * np.pi * 0.9 * t) > 0)
    x = (env * np.sin(2 * np.pi * 700 * t)).astype(np.float32)
    ip = tmp_path / "in.wav"
    audio.write(ip, np.stack([x, x], 1), sr, subtype="PCM_24")

    for variant in ("standard", "xfade", "adaptive"):
        op = tmp_path / f"out_{variant}.wav"
        rc = ps.main(["-i", str(ip), "-o", str(op), "--variant", variant,
                      "--devices", "2", "--allow_any_rate"])
        assert rc == 0, f"{variant}: rc={rc}"
        y, _ = audio.read(op)
        assert y.shape == (len(x), 2)

    # explicit non-linear gate mapping on the xfade variant prints the
    # linear-only note (the explicit-flag detection the NameError broke)
    rc = ps.main(["-i", str(ip), "-o", str(tmp_path / "o2.wav"),
                  "--variant", "xfade", "--devices", "2",
                  "--allow_any_rate", "--gate_mode", "log_percent"])
    assert rc == 0
    assert "LINEAR" in capsys.readouterr().out


def test_sharded_rejects_undersized_shards():
    """A frame's OLA overlap span (n_fft - hop) crossing more than one
    shard boundary would silently produce wrong audio (the halo ppermute
    moves one hop); every step factory must reject the configuration."""
    import pytest

    from tomatis_tpu.parallel.sharded import (check_halo_span, make_mesh,
                                              sharded_stream_step)
    with pytest.raises(ValueError, match="frames_per_shard"):
        check_halo_span(n_fft=4096, hop=512, frames_per_shard=4)
    check_halo_span(n_fft=4096, hop=512, frames_per_shard=7)   # 3584 == 3584
    mesh = make_mesh(data=1)
    with pytest.raises(ValueError, match="frames_per_shard"):
        sharded_stream_step(mesh, 4096, 512, 4, 2, ton=-40.0, toff=-43.0,
                            delay_frames=0,
                            g1_lin=np.ones(2049, np.float32),
                            g2_lin=np.ones(2049, np.float32))
