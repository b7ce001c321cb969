import numpy as np
import jax.numpy as jnp
import pytest

from tomatis_tpu.ops import dsp
from tests.oracle import refdsp


def test_db_to_lin():
    db = np.array([-20.0, 0.0, 6.0, 15.0])
    np.testing.assert_allclose(np.asarray(dsp.db_to_lin(db)),
                               refdsp.db_to_lin(db), rtol=1e-5)


def test_rms_dbfs_matches_reference():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 0.1, 4096).astype(np.float32)
    got = float(dsp.rms_dbfs(jnp.asarray(x)))
    want = refdsp.rms_dbfs(x.astype(np.float64))
    assert abs(got - want) < 1e-3


def test_rms_dbfs_silence():
    # double-EPS idiom: silence gives a finite, very low level
    got = float(dsp.rms_dbfs(jnp.zeros(1024)))
    want = refdsp.rms_dbfs(np.zeros(1024))
    assert np.isfinite(got)
    assert abs(got - want) < 1e-3


def test_frame_levels_equal_power_mono_path():
    rng = np.random.default_rng(1)
    frames = rng.normal(0, 0.05, (7, 512, 2)).astype(np.float32)
    fused = np.asarray(dsp.frame_levels_dbfs(jnp.asarray(frames)))
    for i in range(7):
        mono = np.sqrt(np.mean(frames[i] ** 2, axis=1))
        assert abs(fused[i] - refdsp.rms_dbfs(mono)) < 1e-3


def test_gate_mappings():
    assert dsp.gate_ui_to_dbfs(50) == -50.0
    assert dsp.gate_ui_to_dbfs(50, 1.0, -61.08) == pytest.approx(-11.08)
    assert dsp.gate_ui_to_dbfs_log_percent(0) == -80.0
    assert dsp.gate_ui_to_dbfs_log_percent(50) == -40.0
    assert dsp.gate_ui_to_dbfs_log_percent(100) == 0.0
    assert dsp.gate_ui_to_dbfs_log_percent(50, 60.0) == -30.0


@pytest.mark.parametrize("fc,slope,lo,hi", [
    (1000.0, 12.0, 15.0, -15.0),
    (1000.0, 12.0, -15.0, 15.0),
    (1000.0, 6.0, 30.0, 30.0),   # same-sign plateaus (clip() would break)
    (720.0, 18.0, -9.0, -3.0),
])
def test_tilt_gain_curve_matches_reference(fc, slope, lo, hi):
    freqs = np.fft.rfftfreq(4096, d=1.0 / 48000.0)
    got = np.asarray(dsp.build_tilt_gain_db(freqs, fc, slope, lo, hi))
    want = refdsp.tilt_gain_db(freqs, fc, slope, lo, hi)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_tilt_gain_zero_at_fc_and_dc_bin():
    freqs = np.fft.rfftfreq(4096, d=1.0 / 48000.0)
    g = np.asarray(dsp.build_tilt_gain_db(freqs, 1000.0, 12.0, 15.0, -15.0))
    # DC bin is clamped to f=1 Hz -> low-side plateau (reference behavior)
    assert g[0] == pytest.approx(15.0, abs=1e-4)
    # monotone decreasing across fc
    k = np.searchsorted(freqs, 1000.0)
    assert g[k - 1] >= 0.0 >= g[k + 1]


def test_tilt_platform_freqs():
    f_lo, f_hi = dsp.tilt_platform_freqs(1000.0, 12.0, 15.0, -15.0)
    assert f_lo == pytest.approx(1000.0 * 2 ** (-15.0 / 12.0))
    assert f_hi == pytest.approx(1000.0 * 2 ** (15.0 / 12.0))


def test_tilt_index_sign():
    freqs = np.fft.rfftfreq(4096, d=1.0 / 48000.0)
    spec = np.ones_like(freqs)
    ti_flat = float(dsp.tilt_index_db(jnp.asarray(spec), freqs))
    spec_hi = np.where(freqs > 1500, 10.0, 1.0)
    ti_hi = float(dsp.tilt_index_db(jnp.asarray(spec_hi), freqs))
    assert ti_hi > ti_flat
