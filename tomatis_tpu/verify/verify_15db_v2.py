"""±15 dB verifier v2 — adaptive-processor variant (capability parity with
ref src/verify_tomatis_15db_v2.py): levels computed once, gate simulated
per candidate threshold with a frame-based up-delay, auto threshold solve
(binary search to a target C2 ratio), conditional spectrum with weak-frame
rejection and per-frame 900-1100 Hz anchor normalization, platform/slope
RMSE metrics, Tilt Index with weak-frame rejection.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from tomatis_tpu.io import audio
from tomatis_tpu.ops import dsp, gate as gate_ops, stft
from tomatis_tpu.verify.validate_layer1 import (_inrange_frame_levels,
                                                find_stable_frames)
from tomatis_tpu.verify.verify_15db import (analyze_tilt_index,
                                            check_engineering,
                                            compute_tilt_index)


def compute_frame_levels(x: np.ndarray, sr: int, n_fft: int, hop: int):
    """In-range frame levels (ref :101-123), batched on device."""
    return _inrange_frame_levels(x, n_fft, hop)


def simulate_gate_frames(levels, threshold_dbfs, hyst_db,
                         up_delay_frames: int = 0):
    """Frame-count up-delay gate (ref :126-152) via the associative scan."""
    states, _ = gate_ops.gate_updelay(
        jnp.asarray(np.asarray(levels, np.float32)),
        threshold_dbfs + hyst_db / 2.0, threshold_dbfs - hyst_db / 2.0,
        int(up_delay_frames))
    return ["C1" if s == 1 else "C2" for s in np.asarray(states)]


def find_optimal_threshold(levels, hyst_db, target_c2_ratio=0.5,
                           up_delay_frames: int = 0):
    """Binary search to the target C2 ratio (ref :155-199)."""
    levels = np.asarray(levels)
    t_low = float(np.min(levels)) - 10
    t_high = float(np.max(levels)) + 10
    best_t = float(np.median(levels))
    best_ratio = 0.0
    best_diff = 1.0
    lv = jnp.asarray(levels.astype(np.float32))

    def ratio_fn(ton, toff):
        # gate_updelay is module-level jitted (one compile per (F, D))
        states, _ = gate_ops.gate_updelay(lv, ton, toff, up_delay_frames)
        return np.mean(np.asarray(states) == 2)

    for _ in range(30):
        t_mid = (t_low + t_high) / 2
        r = float(ratio_fn(t_mid + hyst_db / 2, t_mid - hyst_db / 2))
        d = abs(r - target_c2_ratio)
        if d < best_diff:
            best_diff, best_t, best_ratio = d, t_mid, r
        if d < 0.01:
            break
        if r < target_c2_ratio:
            t_high = t_mid
        else:
            t_low = t_mid
    return best_t, best_ratio


@jax.jit
def _anchored_ratios(fx, fy, win, anchor_mask):
    """Per-frame channel-mean |Y|/|X| ratios normalized to the anchor
    band's mean. Module-level jit: one compile per shape."""
    X = jnp.mean(jnp.abs(jnp.fft.rfft(
        jnp.transpose(fx, (0, 2, 1)) * win)), axis=1)
    Y = jnp.mean(jnp.abs(jnp.fft.rfft(
        jnp.transpose(fy, (0, 2, 1)) * win)), axis=1)
    X = jnp.maximum(X, 1e-10)
    r = Y / X
    ag = jnp.mean(jnp.where(anchor_mask, r, 0.0), axis=-1) \
        * (r.shape[-1] / jnp.sum(anchor_mask))
    return jnp.where(ag[:, None] > 0, r / ag[:, None], r)


def conditional_spectrum_v2(x, y, sr, states, levels, n_fft, hop,
                            level_percentile: float = 10,
                            anchor_band=(900, 1100), batch: int = 512):
    """ref :270-369: drop the weakest level_percentile% frames; normalize
    each frame's |Y|/|X| ratio to its anchor-band mean; median per state."""
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
    level_threshold = float(np.percentile(levels, level_percentile))
    c1_idx, c2_idx = find_stable_frames(states, margin=2)
    freqs = stft.rfft_freqs(n_fft, sr)
    nbins = len(freqs)
    win = jnp.asarray(stft.hann_symmetric(n_fft))
    anchor_mask = jnp.asarray((freqs >= anchor_band[0])
                              & (freqs <= anchor_band[1]))

    def ratios(fx, fy):
        return _anchored_ratios(fx, fy, win, anchor_mask)

    # frame i of the level framing starts at padded coord (k0+i)*hop —
    # off == 0 whenever hop divides pad (every default); see
    # validate_layer1.conditional_spectrum
    off = -(-pad // hop) * hop - pad

    def collect(idx_list):
        keep = []
        for b0 in range(0, len(idx_list), batch):
            ids = idx_list[b0:b0 + batch]
            ids = ids[(ids * hop + off >= 0)
                      & (ids * hop + off + n_fft <= total)]
            ids = ids[np.asarray(levels)[ids] >= level_threshold]
            if len(ids) == 0:
                continue
            n = len(ids)
            ch = xp.shape[1]
            fx = np.zeros((batch, n_fft, ch), np.float32)
            fy = np.zeros((batch, n_fft, ch), np.float32)
            for j, i in enumerate(ids):
                s = i * hop + off + pad
                fx[j] = xp[s:s + n_fft]
                fy[j] = yp[s:s + n_fft]
            keep.append(np.asarray(
                ratios(jnp.asarray(fx), jnp.asarray(fy)))[:n])
        if not keep:
            return np.zeros(nbins), 0
        allr = np.concatenate(keep, 0)
        return 20.0 * np.log10(np.median(allr, axis=0) + dsp.EPS), len(allr)

    c1_db, n1 = collect(c1_idx)
    c2_db, n2 = collect(c2_idx)
    return freqs, c1_db, c2_db, n1, n2


def compute_spectrum_metrics_v2(freqs, c1_db, c2_db, c1_theory, c2_theory,
                                fc, gain_limit, slope=12.0) -> dict:
    """Platform/slope segment RMSE + fc band error (ref :372-418).

    The reference hardcodes a 12 dB/oct corner here even though its CLI
    takes --slope (ref :377-378 vs :549-550) — identical at the default
    slope; this version derives the corners from the actual slope so the
    platform/slope bands line up with the theory curves being compared.
    """
    m = {}
    f_lo = fc * 2 ** (-gain_limit / slope)
    f_hi = fc * 2 ** (gain_limit / slope)
    lo = (freqs >= 100) & (freqs <= f_lo * 0.8)
    if np.any(lo):
        m["c1_lo_platform_rmse"] = float(np.sqrt(np.mean(
            (c1_db[lo] - c1_theory[lo]) ** 2)))
        m["c2_lo_platform_rmse"] = float(np.sqrt(np.mean(
            (c2_db[lo] - c2_theory[lo]) ** 2)))
        m["c1_lo_platform_mean"] = float(np.mean(c1_db[lo]))
        m["c2_lo_platform_mean"] = float(np.mean(c2_db[lo]))
    hi = (freqs >= f_hi * 1.2) & (freqs <= 10000)
    if np.any(hi):
        m["c1_hi_platform_rmse"] = float(np.sqrt(np.mean(
            (c1_db[hi] - c1_theory[hi]) ** 2)))
        m["c2_hi_platform_rmse"] = float(np.sqrt(np.mean(
            (c2_db[hi] - c2_theory[hi]) ** 2)))
        m["c1_hi_platform_mean"] = float(np.mean(c1_db[hi]))
        m["c2_hi_platform_mean"] = float(np.mean(c2_db[hi]))
    sl = (freqs >= f_lo * 1.2) & (freqs <= f_hi * 0.8)
    if np.any(sl):
        m["c1_slope_rmse"] = float(np.sqrt(np.mean(
            (c1_db[sl] - c1_theory[sl]) ** 2)))
        m["c2_slope_rmse"] = float(np.sqrt(np.mean(
            (c2_db[sl] - c2_theory[sl]) ** 2)))
    f = (freqs >= 900) & (freqs <= 1100)
    if np.any(f):
        m["c1_fc_error"] = float(abs(np.mean(c1_db[f])))
        m["c2_fc_error"] = float(abs(np.mean(c2_db[f])))
    return m


def verify_v2(in_path, out_path, hyst_db=1.0, up_delay_ms=0.0,
              target_c2=0.5, fc=1000.0, slope=12.0, c1_low=15.0,
              c1_high=-15.0, c2_low=-15.0, c2_high=15.0, n_fft=4096,
              hop=2048, level_percentile=10.0,
              out_prefix="verify_15db_v2") -> dict:
    gain_limit = abs(c1_low)
    results = {"pass": True, "checks": {}}

    eng = check_engineering(in_path, out_path)
    eng_pass = (eng["sr_match"] and eng["ch_match"] and eng["frames_match"]
                and eng["peak_safe"] and eng["dc_safe"])
    results["checks"]["engineering"] = dict(eng, **{"pass": eng_pass})
    if not eng_pass:
        results["pass"] = False

    x, sr = audio.read(in_path)
    levels = compute_frame_levels(x, sr, n_fft, hop)
    frame_ms = hop / sr * 1000.0
    up_frames = int(round(up_delay_ms / frame_ms)) if up_delay_ms else 0
    t_opt, c2_ratio = find_optimal_threshold(levels, hyst_db, target_c2,
                                             up_frames)
    states = simulate_gate_frames(levels, t_opt, hyst_db, up_frames)
    results["auto_threshold_dbfs"] = t_opt
    results["achieved_c2_ratio"] = c2_ratio
    st_arr = np.asarray(states)
    results["switch_count"] = int(np.sum(st_arr[1:] != st_arr[:-1])) \
        if len(st_arr) else 0
    # ref :622 gates the 50% target at 48-52%; generalized to +-2% of the
    # requested target
    c2_ratio_ok = abs(c2_ratio - target_c2) <= 0.02
    results["c2_ratio_ok"] = c2_ratio_ok

    y, _ = audio.read(out_path)
    freqs, c1_db, c2_db, n1, n2 = conditional_spectrum_v2(
        x, y, sr, states, levels, n_fft, hop, level_percentile)
    c1_theory = np.asarray(dsp.build_tilt_gain_db(freqs, fc, slope,
                                                  c1_low, c1_high))
    c2_theory = np.asarray(dsp.build_tilt_gain_db(freqs, fc, slope,
                                                  c2_low, c2_high))
    metrics = compute_spectrum_metrics_v2(freqs, c1_db, c2_db, c1_theory,
                                          c2_theory, fc, gain_limit, slope)
    # the v2 acceptance gates are the reference's stricter digital-music
    # thresholds (ref :671-679): platform RMSE < 0.5, slope RMSE < 1.0,
    # fc error < 0.5
    platform_rmse_ok = all(metrics.get(k, 99) < 0.5 for k in (
        "c1_lo_platform_rmse", "c2_lo_platform_rmse",
        "c1_hi_platform_rmse", "c2_hi_platform_rmse"))
    slope_rmse_ok = (metrics.get("c1_slope_rmse", 99) < 1.0
                     and metrics.get("c2_slope_rmse", 99) < 1.0)
    fc_ok = (metrics.get("c1_fc_error", 99) < 0.5
             and metrics.get("c2_fc_error", 99) < 0.5)
    spectrum_pass = platform_rmse_ok and slope_rmse_ok and fc_ok
    results["checks"]["spectrum"] = dict(
        metrics, c1_frames=n1, c2_frames=n2,
        platform_rmse_ok=platform_rmse_ok, slope_rmse_ok=slope_rmse_ok,
        fc_ok=fc_ok, **{"pass": spectrum_pass})
    if not spectrum_pass:
        results["pass"] = False

    ti = compute_tilt_index(x, y, sr, states, n_fft, hop)
    ti_stats = analyze_tilt_index(ti)
    ti_stats["effect_ok"] = ti_stats.get("ti_effect", 0) > 5.0  # WARN-only
    results["checks"]["tilt_index"] = ti_stats

    if not c2_ratio_ok:   # gates the overall verdict (ref :831-838)
        results["pass"] = False

    if out_prefix:
        _write_report_v2(f"{out_prefix}_report.txt", results)
        from tomatis_tpu.verify.verify_15db import (_plot_spectrum,
                                                    _write_spectrum_csv)
        _write_spectrum_csv(f"{out_prefix}_spectrum.csv", freqs, c1_db,
                            c2_db, c1_theory, c2_theory)
        _plot_spectrum(f"{out_prefix}_spectrum.png", freqs, c1_db, c2_db,
                       c1_theory, c2_theory, fc, gain_limit, n1, n2)
        _plot_ti_v2(f"{out_prefix}_tilt_index.png", ti, ti_stats)
    return results


def _plot_ti_v2(path, ti, ti_stats):
    """Two-panel TI figure — input-vs-output and C1-vs-C2 histograms with
    the separation in the title (ref src/verify_tomatis_15db_v2.py:785-809;
    v1 draws a single combined panel)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    fig, axes = plt.subplots(1, 2, figsize=(14, 5))
    ax = axes[0]
    for key, color in [("input", "gray"), ("output", "b")]:
        if len(ti[key]):
            ax.hist(ti[key], bins=50, alpha=0.5, label=key.capitalize(),
                    color=color)
    ax.set_xlabel("Tilt Index (dB)")
    ax.set_ylabel("Count")
    ax.set_title("Tilt Index: Input vs Output")
    ax.legend()
    ax.grid(True, alpha=0.3)
    ax = axes[1]
    for key, color in [("c1", "b"), ("c2", "r")]:
        if len(ti[key]):
            ax.hist(ti[key], bins=50, alpha=0.5, color=color,
                    label=f"{key.upper()} "
                          f"(mean={ti_stats.get(key + '_mean', 0):.1f})")
    ax.set_xlabel("Tilt Index (dB)")
    ax.set_ylabel("Count")
    ax.set_title("Tilt Index: C1 vs C2 "
                 f"(separation={ti_stats.get('ti_effect', 0):.1f} dB)")
    ax.legend()
    ax.grid(True, alpha=0.3)
    plt.tight_layout()
    plt.savefig(path, dpi=150)
    plt.close(fig)


def _write_report_v2(path, results):
    """Sectioned bilingual v2 report — same layout and field lines as the
    reference (ref src/verify_tomatis_15db_v2.py:558-560, 582-584,
    627-630, 691-695, 731-734, 837-838)."""
    eng = results["checks"]["engineering"]
    sp = results["checks"]["spectrum"]
    ti = results["checks"]["tilt_index"]
    ok = lambda b: "PASS" if b else "FAIL"  # noqa: E731
    lines = ["Tomatis ±15dB 自适应验证报告 v2", "=" * 50]
    lines += [
        "\nA. 工程检查",
        f"  结果: {ok(eng['pass'])}",
        f"  峰值: {eng['peak']:.4f}",
    ]
    lines += [
        "\nB. 自适应门控",
        f"  最优阈值 T: {results['auto_threshold_dbfs']:.2f} dBFS",
        f"  C2 占比: {results['achieved_c2_ratio'] * 100:.1f}%",
        f"  切换次数: {results['switch_count']}",
    ]
    lines += [
        "\nC. 条件频谱验证",
        f"  有效帧: C1={sp['c1_frames']}, C2={sp['c2_frames']}",
        f"  平台 RMSE: {ok(sp['platform_rmse_ok'])}",
        f"  斜坡 RMSE: {ok(sp['slope_rmse_ok'])}",
        f"  fc 误差: {ok(sp['fc_ok'])}",
    ]
    lines += [
        "\nD. 效果量化",
        f"  C1 TI: {ti.get('c1_mean', 0):.2f} dB",
        f"  C2 TI: {ti.get('c2_mean', 0):.2f} dB",
        f"  分离度: {ti.get('ti_effect', 0):.2f} dB",
    ]
    lines += ["\n" + "=" * 50,
              f"总体结果: {ok(results['pass'])}"]
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
