"""Device parameter reverse-engineering (capability parity with
ref src/reverse_engineer_params.py): align in/out, per-frame spectral diff
-> tilt index (2-6 kHz minus 200-500 Hz), tilt-vs-level table over 5 dB
bins, gate threshold estimate from the C1/C2 level separation, histogram,
CSV dump. The per-frame loop is one batched device op."""
from __future__ import annotations

import csv
import functools

import jax
import jax.numpy as jnp
import numpy as np

from tomatis_tpu.analysis.align import EPS, power_mono
from tomatis_tpu.analysis.compare import align_pair, find_delay_full
from tomatis_tpu.io import audio
from tomatis_tpu.ops import stft

LEVEL_BINS = [(-70, -60), (-60, -55), (-55, -50), (-50, -45), (-45, -40),
              (-40, -35), (-35, -30), (-30, -25), (-25, -20), (-20, -15),
              (-15, -10)]
HIST_BINS = [(-40, -30), (-30, -20), (-20, -10), (-10, 0), (0, 10),
             (10, 20), (20, 30), (30, 40)]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "n_frames",
                                             "sr"))
def _frame_tilts(mono_in, mono_out, n_fft, hop, n_frames, sr):
    win = jnp.asarray(stft.hann_symmetric(n_fft))
    freqs = jnp.asarray(stft.rfft_freqs(n_fft, sr))
    fi = stft.frame_signal(mono_in[:, None], n_fft, hop, n_frames)[:, 0, :]
    fo = stft.frame_signal(mono_out[:, None], n_fft, hop, n_frames)[:, 0, :]
    lv = 20.0 * jnp.log10(jnp.sqrt(jnp.mean(jnp.square(fi), axis=-1) + EPS)
                          + EPS)
    di = 20.0 * jnp.log10(jnp.abs(jnp.fft.rfft(fi * win)) + EPS)
    do = 20.0 * jnp.log10(jnp.abs(jnp.fft.rfft(fo * win)) + EPS)
    diff = do - di
    lo = (freqs >= 200) & (freqs < 500)
    hi = (freqs >= 2000) & (freqs < 6000)
    tilt = (jnp.sum(jnp.where(hi, diff, 0.0), axis=-1) / jnp.sum(hi)
            - jnp.sum(jnp.where(lo, diff, 0.0), axis=-1) / jnp.sum(lo))
    return lv, tilt


def analyze_device_params(input_path, output_path, out_csv=None,
                          sr: int = 48000, n_fft: int = 4096,
                          hop: int = 2048) -> dict:
    inp_lr, sr_in = audio.read(input_path)
    out_lr, sr_out = audio.read(output_path)
    # the band edges, times and delay math all assume `sr`; silently
    # trusting the parameter against e.g. 44.1 kHz files would shift
    # every band by 8% with no error (compare_audio raises likewise)
    if sr_in != sr or sr_out != sr:
        raise ValueError(f"sample rate mismatch: files are "
                         f"{sr_in}/{sr_out} Hz, sr={sr} — pass sr=")
    delay = find_delay_full(power_mono(inp_lr), power_mono(out_lr), sr)
    inp_a, out_a = align_pair(inp_lr, out_lr, delay)
    mono_i = power_mono(inp_a).astype(np.float32)
    mono_o = power_mono(out_a).astype(np.float32)
    n_frames = 1 + (len(mono_i) - n_fft) // hop
    lv, tilt = _frame_tilts(jnp.asarray(mono_i), jnp.asarray(mono_o),
                            n_fft, hop, n_frames, sr)
    lv = np.asarray(lv)
    tilt = np.asarray(tilt)
    times = np.arange(n_frames) * hop / sr

    level_table = []
    for lo, hi in LEVEL_BINS:
        sel = (lv >= lo) & (lv < hi)
        if sel.any():
            level_table.append(dict(
                lo=lo, hi=hi, n=int(sel.sum()),
                mean_tilt=float(tilt[sel].mean()),
                std_tilt=float(tilt[sel].std()),
                state="C1" if tilt[sel].mean() < 0 else "C2"))

    c1_sel = tilt < -5
    c2_sel = tilt > 5
    threshold = None
    if c1_sel.any() and c2_sel.any():
        c1_max = float(lv[c1_sel].max())
        c2_min = float(lv[c2_sel].min())
        threshold = dict(c1_frames=int(c1_sel.sum()),
                         c2_frames=int(c2_sel.sum()),
                         c1_max_level=c1_max, c2_min_level=c2_min,
                         estimate=(c1_max + c2_min) / 2)

    hist = []
    for lo, hi in HIST_BINS:
        cnt = int(np.sum((tilt >= lo) & (tilt < hi)))
        hist.append(dict(lo=lo, hi=hi, count=cnt,
                         pct=cnt / max(1, len(tilt)) * 100))

    if out_csv:
        with open(out_csv, "w", newline="", encoding="utf-8") as f:
            w = csv.writer(f)
            w.writerow(["frame", "time_sec", "inp_level_dbfs", "tilt_db"])
            for i in range(n_frames):
                w.writerow([i, f"{times[i]:.3f}", f"{lv[i]:.2f}",
                            f"{tilt[i]:.2f}"])
    return dict(delay_samples=delay, n_frames=n_frames,
                level_table=level_table, gate_threshold=threshold,
                histogram=hist, levels=lv, tilts=tilt)
