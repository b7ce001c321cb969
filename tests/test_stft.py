import numpy as np
import jax.numpy as jnp
import pytest

from tomatis_tpu.ops import stft, dsp
from tests.oracle import refdsp


def test_hann_windows():
    np.testing.assert_allclose(stft.hann_symmetric(16), np.hanning(16), atol=1e-7)
    w = stft.hann_periodic(16)
    assert w[0] == 0.0 and abs(w[8] - 1.0) < 1e-7  # periodic: peak at n/2


def test_num_frames_and_pad_end():
    # reference loop: frames while start + n_fft <= len
    assert stft.num_frames(4096, 4096, 2048) == 1
    assert stft.num_frames(4097, 4096, 2048) == 1
    assert stft.num_frames(6144, 4096, 2048) == 2
    # pad_end formula (ref src/process_tomatis.py:272)
    for N in [48000, 48001, 100000, 4096]:
        pe = stft.pad_end(N, 4096, 2048)
        assert (N + pe - 4096) % 2048 == 0
        assert 0 <= pe < 2048


@pytest.mark.parametrize("hop", [2048, 1024, 1000])
def test_frame_signal(hop):
    rng = np.random.default_rng(0)
    n_fft, F = 4096, 9
    S = (F - 1) * hop + n_fft
    x = rng.normal(0, 1, (S + 5, 2)).astype(np.float32)
    frames = np.asarray(stft.frame_signal(jnp.asarray(x), n_fft, hop, F))
    assert frames.shape == (F, 2, n_fft)
    for f in [0, 3, F - 1]:
        np.testing.assert_array_equal(frames[f], x[f * hop:f * hop + n_fft].T)


@pytest.mark.parametrize("hop", [2048, 1536])
def test_overlap_add_matches_scatter(hop):
    rng = np.random.default_rng(1)
    y = rng.normal(0, 1, (7, 2, 4096)).astype(np.float32)
    out = np.asarray(stft.overlap_add(jnp.asarray(y), hop))
    L = 6 * hop + 4096
    want = np.zeros((L, 2), np.float64)
    for f in range(7):
        want[f * hop:f * hop + 4096] += y[f].T
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_unity_gain_reconstruction():
    """gain=1 end-to-end: windowed OLA / wsum reproduces the input in the
    interior (perfect-reconstruction property the reference relies on)."""
    rng = np.random.default_rng(2)
    n_fft, hop = 1024, 512
    S = 16 * hop + n_fft
    x = rng.normal(0, 0.3, (S, 2)).astype(np.float32)
    F = stft.num_frames(S, n_fft, hop)
    win = jnp.asarray(stft.hann_symmetric(n_fft))
    frames = stft.frame_signal(jnp.asarray(x), n_fft, hop, F)
    y = stft.apply_gain_bank(frames, win, jnp.ones(n_fft // 2 + 1))
    out = np.asarray(stft.overlap_add(y, hop))
    wsum = np.asarray(stft.window_ola(win * win, F, hop))
    rec = out / (wsum[:, None] + dsp.EPS)
    # interior only (first/last window not fully covered)
    sl = slice(n_fft, S - n_fft)
    np.testing.assert_allclose(rec[sl], x[sl], atol=2e-5)


def test_filter_bank_matches_numpy_oracle():
    rng = np.random.default_rng(3)
    n_fft, hop, F = 1024, 512, 12
    S = (F - 1) * hop + n_fft
    x = rng.normal(0, 0.2, (S, 2)).astype(np.float32)
    freqs = np.fft.rfftfreq(n_fft, 1 / 48000)
    g_db = refdsp.tilt_gain_db(freqs, 1000.0, 12.0, 15.0, -15.0)
    gains = np.repeat(refdsp.db_to_lin(g_db)[None, :].astype(np.float32), F, 0)

    want_y, want_w = refdsp.stft_ola_loop(x, gains, n_fft, hop)

    win = jnp.asarray(stft.hann_symmetric(n_fft))
    frames = stft.frame_signal(jnp.asarray(x), n_fft, hop, F)
    y = stft.apply_gain_bank(frames, win, jnp.asarray(gains))
    got_y = np.asarray(stft.overlap_add(y, hop))
    got_w = np.asarray(stft.window_ola(win * win, F, hop))

    np.testing.assert_allclose(got_y, want_y, atol=3e-5)
    np.testing.assert_allclose(got_w, want_w, atol=1e-4)
    # spectral deviation < 0.1 dB where signal has energy
    rec_got = got_y / (got_w[:, None] + refdsp.EPS)
    rec_want = want_y / (want_w[:, None] + refdsp.EPS)
    Gg = np.abs(np.fft.rfft(rec_got[1024:-1024, 0]))
    Gw = np.abs(np.fft.rfft(rec_want[1024:-1024, 0]))
    mask = Gw > np.max(Gw) * 1e-3
    dev_db = 20 * np.abs(np.log10((Gg[mask] + 1e-12) / (Gw[mask] + 1e-12)))
    assert np.max(dev_db) < 0.1


def test_per_frame_gain_rows():
    rng = np.random.default_rng(4)
    n_fft, hop, F = 512, 256, 6
    S = (F - 1) * hop + n_fft
    x = rng.normal(0, 0.2, (S, 1)).astype(np.float32)
    gains = rng.uniform(0.2, 2.0, (F, n_fft // 2 + 1)).astype(np.float32)
    want_y, _ = refdsp.stft_ola_loop(x, gains, n_fft, hop)
    win = jnp.asarray(stft.hann_symmetric(n_fft))
    frames = stft.frame_signal(jnp.asarray(x), n_fft, hop, F)
    y = stft.apply_gain_bank(frames, win, jnp.asarray(gains))
    got_y = np.asarray(stft.overlap_add(y, hop))
    np.testing.assert_allclose(got_y, want_y, atol=3e-5)
