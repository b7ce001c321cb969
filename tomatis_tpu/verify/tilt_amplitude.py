"""Tilt amplitude verifier (capability parity with
ref src/verify_tilt_amplitude.py): group frames by input level (< -45 dBFS
-> C1, > -30 dBFS -> C2), average the out-in spectral difference, report
gains at key frequencies and the 4 kHz - 250 Hz tilt vs the +-30 dB theory.
The per-frame FFT loop is one batched device op."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tomatis_tpu.analysis.align import EPS, power_mono
from tomatis_tpu.analysis.compare import align_pair, find_delay_full
from tomatis_tpu.io import audio
from tomatis_tpu.ops import stft

TEST_FREQS = (250, 500, 1000, 2000, 4000, 8000)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "n_frames"))
def _frame_specs(mono_in, mono_out, n_fft, hop, n_frames):
    win = jnp.asarray(stft.hann_symmetric(n_fft))
    fi = stft.frame_signal(mono_in[:, None], n_fft, hop, n_frames)[:, 0, :]
    fo = stft.frame_signal(mono_out[:, None], n_fft, hop, n_frames)[:, 0, :]
    lv = 20.0 * jnp.log10(jnp.sqrt(jnp.mean(jnp.square(fi), axis=-1) + EPS)
                          + EPS)
    d_in = 20.0 * jnp.log10(jnp.abs(jnp.fft.rfft(fi * win)) + EPS)
    d_out = 20.0 * jnp.log10(jnp.abs(jnp.fft.rfft(fo * win)) + EPS)
    return lv, d_out - d_in


def band_power_db(spec_db, freqs, f1, f2) -> float:
    m = (freqs >= f1) & (freqs < f2)
    return float(np.mean(np.asarray(spec_db)[m]))


def analyze_tilt_amplitude(input_path, output_path, sr: int = 48000,
                           n_fft: int = 4096, hop: int = 2048,
                           c1_below: float = -45.0,
                           c2_above: float = -30.0) -> dict:
    inp_lr, sr_in = audio.read(input_path)
    out_lr, sr_out = audio.read(output_path)
    # band edges and delay math assume `sr` — refuse a silent mismatch
    # (same guard as compare_audio / reverse-engineer)
    if sr_in != sr or sr_out != sr:
        raise ValueError(f"sample rate mismatch: files are "
                         f"{sr_in}/{sr_out} Hz, sr={sr} — pass sr=")
    delay = find_delay_full(power_mono(inp_lr), power_mono(out_lr), sr)
    inp_a, out_a = align_pair(inp_lr, out_lr, delay)

    mono_i = power_mono(inp_a).astype(np.float32)
    mono_o = power_mono(out_a).astype(np.float32)
    n_frames = 1 + (len(mono_i) - n_fft) // hop
    lv, diff = _frame_specs(jnp.asarray(mono_i), jnp.asarray(mono_o),
                            n_fft, hop, n_frames)
    lv = np.asarray(lv)
    diff = np.asarray(diff)
    freqs = stft.rfft_freqs(n_fft, sr)

    c1_sel = lv < c1_below
    c2_sel = lv > c2_above
    res = dict(delay_samples=delay, n_c1=int(c1_sel.sum()),
               n_c2=int(c2_sel.sum()), freqs=freqs)
    if res["n_c1"] > 10 and res["n_c2"] > 10:
        c1_avg = diff[c1_sel].mean(axis=0)
        c2_avg = diff[c2_sel].mean(axis=0)
        res["c1_gains"] = {f: float(c1_avg[np.argmin(np.abs(freqs - f))])
                           for f in TEST_FREQS}
        res["c2_gains"] = {f: float(c2_avg[np.argmin(np.abs(freqs - f))])
                           for f in TEST_FREQS}
        res["c1_tilt"] = (band_power_db(c1_avg, freqs, 3500, 4500)
                          - band_power_db(c1_avg, freqs, 200, 300))
        res["c2_tilt"] = (band_power_db(c2_avg, freqs, 3500, 4500)
                          - band_power_db(c2_avg, freqs, 200, 300))
        res["c1_avg"] = c1_avg
        res["c2_avg"] = c2_avg
    return res
