"""Layer-1 validator (capability parity with ref src/validate_layer1.py):
four-part PASS/FAIL audit of a processed file against its input + state CSV.

A. engineering: sr/ch/sample-count equality, peak < 0.98 (ref :62-88)
B. independent gate recomputation vs the CSV: mismatch < 1%, level
   agreement < 0.1 dB (ref :110-193,481-513) — note the validator's state
   machine only advances on in-range frames, unlike the processor's
   (pad frames excluded; ref :137-159)
C. gate statistics: C2 ratio in [5%, 95%], short-run (<=3) ratio < 30%
D. conditional spectrum: median per-bin |Y|/|X| over stable frames vs the
   theoretical tilt curves, RMSE < 1.5 dB per band (ref :245-398,547-598)

TPU-native: frame levels and the |rfft| ratios are batched device ops;
the gate recomputation is the associative-scan gate; the per-bin median
reduces on device so only [bins] cross the wire.
"""
from __future__ import annotations

import csv
import functools

import jax
import jax.numpy as jnp
import numpy as np

from tomatis_tpu.io import audio
from tomatis_tpu.ops import dsp, gate as gate_ops, stft
from tomatis_tpu.utils.stateio import read_state_csv


def check_engineering(in_path, out_path, y: np.ndarray | None = None) -> dict:
    """y: pre-decoded output audio, so callers that also analyze the
    output (validate, verify-15db) decode the file once, not 2-3 times."""
    a = audio.info(in_path)
    b = audio.info(out_path)
    if y is None:
        y, _ = audio.read(out_path)
    peak = float(np.max(np.abs(y))) if y.size else 0.0
    return dict(
        sr_in=a.samplerate, sr_out=b.samplerate,
        sr_match=a.samplerate == b.samplerate,
        ch_in=a.channels, ch_out=b.channels,
        ch_match=a.channels == b.channels,
        frames_in=a.frames, frames_out=b.frames,
        frames_match=a.frames == b.frames,
        frames_diff=b.frames - a.frames,
        peak=peak, peak_safe=peak < 0.98)


def _inrange_frame_levels(x: np.ndarray, n_fft: int, hop: int,
                          chunk: int = 4096) -> np.ndarray:
    """Levels of frames whose start lies in [0, total) after half-window
    padding (the validator/adaptive frame convention), batched on device."""
    total, ch = x.shape
    pad = n_fft // 2
    xp = np.concatenate([np.zeros((pad, ch), np.float32), x,
                         np.zeros((pad, ch), np.float32)])
    k0 = -(-pad // hop)
    k1 = min((len(xp) - n_fft) // hop, (total + pad - 1) // hop)
    F = max(0, k1 - k0 + 1)
    if F == 0:
        return np.zeros(0, np.float32)

    need = (chunk - 1) * hop + n_fft
    out = np.empty(F, np.float32)
    for f0 in range(0, F, chunk):
        nf = min(chunk, F - f0)
        s = (k0 + f0) * hop
        sig = xp[s:s + need]
        if len(sig) < need:
            sig = np.concatenate(
                [sig, np.zeros((need - len(sig), ch), np.float32)])
        out[f0:f0 + nf] = np.asarray(stft.frame_levels_chunk(
            sig, n_fft, hop, chunk))[:nf]
    return out


def simulate_gate(x: np.ndarray, sr: int, n_fft: int, hop: int,
                  threshold_dbfs: float, hyst_db: float, up_delay_ms: float):
    """Independent gate recomputation over in-range frames (ref :110-163).
    Returns (states ['C1'/'C2'], levels)."""
    levels = _inrange_frame_levels(x, n_fft, hop)
    ton = threshold_dbfs + hyst_db / 2.0
    toff = threshold_dbfs - hyst_db / 2.0
    delay = gate_ops.updelay_frames(int(up_delay_ms * sr / 1000.0), hop)
    states, _ = gate_ops.gate_updelay(jnp.asarray(levels), ton, toff, delay)
    states = np.asarray(states)
    return ["C1" if s == 1 else "C2" for s in states], levels


def compare_gate_states(csv_states, sim_states, sim_levels, csv_levels):
    """CSV vs recomputed states (ref :166-193)."""
    n = min(len(csv_states), len(sim_states))
    cs = np.asarray(csv_states[:n])
    ss = np.asarray(sim_states[:n])
    ld = np.abs(np.asarray(csv_levels[:n]) - np.asarray(sim_levels[:n]))
    mismatch = int(np.sum(cs != ss))
    # switch counts over the SAME common prefix the per-frame comparison
    # uses — counting each side over its own full length reports a
    # spurious diff whenever the CSV and simulation lengths differ
    csv_sw = int(np.sum(cs[1:] != cs[:-1]))
    sim_sw = int(np.sum(ss[1:] != ss[:-1]))
    return dict(
        total_frames=n,
        mismatch_count=mismatch,
        mismatch_rate=mismatch / n if n else 0.0,
        csv_switches=csv_sw, sim_switches=sim_sw,
        switch_diff=abs(csv_sw - sim_sw),
        level_max_diff=float(ld.max()) if n else 0.0,
        level_mean_diff=float(ld.mean()) if n else 0.0)


def analyze_gate_stats(states) -> dict:
    """C2 ratio / switches / run lengths / jitter (ref :200-238)."""
    states = np.asarray(states)
    n = len(states)
    if n == 0:
        return {}
    c2 = int(np.sum(states == "C2"))
    sw = np.flatnonzero(states[1:] != states[:-1])
    run_ends = np.r_[sw, n - 1]
    run_starts = np.r_[0, sw + 1]
    runs = run_ends - run_starts + 1
    short = int(np.sum(runs <= 3))
    return dict(
        total_frames=n, c2_count=c2, c2_ratio=c2 / n,
        switch_count=len(sw), run_count=len(runs),
        run_min=int(runs.min()), run_max=int(runs.max()),
        run_median=float(np.median(runs)),
        short_runs=short, short_run_ratio=short / len(runs))


def find_stable_frames(states, margin: int = 2):
    """Frames whose +-margin window has a constant state (ref :245-258)."""
    s = np.asarray(states)
    n = len(s)
    if n < 2 * margin + 1:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    is_c1 = s == "C1"
    is_c2 = s == "C2"
    w = 2 * margin + 1
    c1_ok = np.convolve(is_c1.astype(np.int64), np.ones(w, np.int64),
                        "valid") == w
    c2_ok = np.convolve(is_c2.astype(np.int64), np.ones(w, np.int64),
                        "valid") == w
    idx = np.arange(margin, n - margin)
    return idx[c1_ok], idx[c2_ok]


@functools.partial(jax.jit, static_argnames=("n_fft",))
def _spec_ratios(fx, fy, n_fft: int):
    """Per-frame channel-mean |Y|/|X| ratios + input levels.
    fx/fy: [B, n_fft, C]. Module-level jit: compiled once per shape."""
    win = jnp.asarray(stft.hann_symmetric(n_fft))
    lv = dsp.frame_levels_dbfs(fx)
    X = jnp.mean(jnp.abs(jnp.fft.rfft(
        jnp.transpose(fx, (0, 2, 1)) * win)), axis=1)
    Y = jnp.mean(jnp.abs(jnp.fft.rfft(
        jnp.transpose(fy, (0, 2, 1)) * win)), axis=1)
    X = jnp.maximum(X, 1e-10)
    return Y / X, lv


def conditional_spectrum(x, y, sr, states, n_fft, hop,
                         level_threshold: float = -60.0, margin: int = 2,
                         batch: int = 512):
    """Median per-bin |Y|/|X| over stable high-level frames, per state
    (ref :261-398). Batched rFFTs on device; medians reduce on device.
    Returns (freqs, c1_db, c2_db, n_c1, n_c2)."""
    if x.ndim == 1:
        x = x[:, None]
    if y.ndim == 1:
        y = y[:, None]
    ch = x.shape[1]
    pad = n_fft // 2
    total = len(x)
    xp = np.concatenate([np.zeros((pad, ch), np.float32), x,
                         np.zeros((pad, ch), np.float32)])
    yp = np.concatenate([np.zeros((pad, ch), np.float32), y[:total],
                         np.zeros((pad, ch), np.float32)])
    c1_idx, c2_idx = find_stable_frames(states, margin)
    freqs = stft.rfft_freqs(n_fft, sr)
    nbins = len(freqs)

    def ratios(fx, fy):
        return _spec_ratios(fx, fy, n_fft)

    # frame i of the level/gate framing starts at padded coord (k0+i)*hop
    # (original coord i*hop + off). off == 0 whenever hop divides pad —
    # every default; the ref slices at i*hop outright (ref :57-64), which
    # only agrees with its own gate framing in that same default case.
    off = -(-pad // hop) * hop - pad

    def collect(idx_list):
        keep = []
        for b0 in range(0, len(idx_list), batch):
            ids = idx_list[b0:b0 + batch]
            ids = ids[(ids * hop + off >= 0)
                      & (ids * hop + off + n_fft <= total)]
            if len(ids) == 0:
                continue
            n = len(ids)
            # pad to the fixed batch size so every call shares one compile
            fx = np.zeros((batch, n_fft, ch), np.float32)
            fy = np.zeros((batch, n_fft, ch), np.float32)
            for j, i in enumerate(ids):
                s = i * hop + off + pad
                fx[j] = xp[s:s + n_fft]
                fy[j] = yp[s:s + n_fft]
            r, lv = ratios(jnp.asarray(fx), jnp.asarray(fy))
            r = np.asarray(r)[:n]
            ok = np.asarray(lv)[:n] >= level_threshold
            if ok.any():
                keep.append(r[ok])
        if not keep:
            return np.zeros(nbins), 0
        allr = np.concatenate(keep, 0)
        med = np.median(allr, axis=0)
        return 20.0 * np.log10(med + dsp.EPS), len(allr)

    c1_db, n1 = collect(c1_idx)
    c2_db, n2 = collect(c2_idx)
    return freqs, c1_db, c2_db, n1, n2


def spectrum_rmse(measured_db, theory_db, freqs, f_low, f_high) -> float:
    mask = (freqs >= f_low) & (freqs <= f_high)
    if not np.any(mask):
        return 0.0
    d = np.asarray(measured_db)[mask] - np.asarray(theory_db)[mask]
    return float(np.sqrt(np.mean(d ** 2)))


BANDS = [("low", 100, 800), ("mid", 800, 1200), ("high", 2000, 8000)]


def validate(in_path, out_path, state_csv, gate_ui=50.0, gate_scale=1.0,
             gate_offset=-61.08, hyst_db=1.0, up_delay_ms=0.0,
             fc=1000.0, slope=12.0, c1_low=5.0, c1_high=-5.0,
             c2_low=-5.0, c2_high=5.0, n_fft=4096, hop=2048,
             out_csv="layer1_spectrum_check.csv",
             out_png="layer1_spectrum_check.png") -> dict:
    """Full A-D audit; returns the results dict with results['pass']."""
    threshold = gate_scale * gate_ui + gate_offset
    results = {"pass": True, "checks": {}, "threshold_dbfs": threshold}

    y, _ = audio.read(out_path)   # decoded once, reused by every check
    eng = check_engineering(in_path, out_path, y=y)
    results["checks"]["engineering"] = eng
    if not (eng["sr_match"] and eng["ch_match"] and eng["frames_match"]
            and eng["peak_safe"]):
        results["pass"] = False

    csvd = read_state_csv(state_csv)
    csv_states = list(csvd["state"])
    csv_levels = csvd["level_dbfs"]

    x, sr = audio.read(in_path)
    sim_states, sim_levels = simulate_gate(
        x, sr, n_fft, hop, threshold, hyst_db, up_delay_ms)
    cmp = compare_gate_states(csv_states, sim_states, sim_levels, csv_levels)
    cmp["pass"] = cmp["mismatch_rate"] < 0.01 and cmp["level_max_diff"] < 0.1
    results["checks"]["gate"] = cmp
    if not cmp["pass"]:
        results["pass"] = False

    stats = analyze_gate_stats(csv_states)
    stats["c2_ratio_ok"] = 0.05 <= stats.get("c2_ratio", 0) <= 0.95
    stats["jitter_ok"] = stats.get("short_run_ratio", 0) < 0.30
    results["checks"]["gate_stats"] = stats  # WARN-only in the reference

    freqs, c1_db, c2_db, n1, n2 = conditional_spectrum(
        x, y, sr, csv_states, n_fft, hop)
    c1_theory = np.asarray(dsp.build_tilt_gain_db(freqs, fc, slope,
                                                  c1_low, c1_high))
    c2_theory = np.asarray(dsp.build_tilt_gain_db(freqs, fc, slope,
                                                  c2_low, c2_high))
    c1_rmse = [spectrum_rmse(c1_db, c1_theory, freqs, lo, hi)
               for _, lo, hi in BANDS]
    c2_rmse = [spectrum_rmse(c2_db, c2_theory, freqs, lo, hi)
               for _, lo, hi in BANDS]
    spectrum_ok = max(c1_rmse + c2_rmse) < 1.5
    results["checks"]["spectrum"] = dict(
        c1_rmse=c1_rmse, c2_rmse=c2_rmse, c1_frames=n1, c2_frames=n2,
        **{"pass": spectrum_ok})
    if not spectrum_ok:
        results["pass"] = False

    if out_csv:
        with open(out_csv, "w", newline="", encoding="utf-8") as f:
            w = csv.writer(f)
            w.writerow(["freq_hz", "c1_measured_db", "c1_theory_db",
                        "c2_measured_db", "c2_theory_db"])
            for i, fr in enumerate(freqs):
                w.writerow([f"{fr:.2f}", f"{c1_db[i]:.4f}",
                            f"{c1_theory[i]:.4f}", f"{c2_db[i]:.4f}",
                            f"{c2_theory[i]:.4f}"])
    if out_png:
        _plot(out_png, freqs, c1_db, c1_theory, c2_db, c2_theory,
              n1, n2, fc)
    return results


def _plot(path, freqs, c1_db, c1_th, c2_db, c2_th, n1, n2, fc):
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    fig, axes = plt.subplots(2, 1, figsize=(12, 8))
    for ax, meas, th, color, name, n in [
            (axes[0], c1_db, c1_th, "b", "C1", n1),
            (axes[1], c2_db, c2_th, "r", "C2", n2)]:
        ax.semilogx(freqs, meas, color + "-", label=f"{name} measured",
                    alpha=0.7)
        ax.semilogx(freqs, th, color + "--", label=f"{name} theory",
                    linewidth=2)
        ax.axhline(0, color="gray", linestyle=":")
        ax.axvline(fc, color="red", linestyle=":", label=f"fc={fc}Hz")
        ax.set_xlim(20, 20000)
        ax.set_ylim(-10, 10)
        ax.set_xlabel("Frequency (Hz)")
        ax.set_ylabel("Gain (dB)")
        ax.set_title(f"{name} Spectrum (n={n})")
        ax.legend()
        ax.grid(True, alpha=0.3)
    plt.tight_layout()
    plt.savefig(path, dpi=150)
    plt.close(fig)
