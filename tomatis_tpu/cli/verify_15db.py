"""CLI: ±15 dB verifier (parity with ref src/verify_tomatis_15db.py CLI;
defaults from calibration_v2)."""
from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="tomatis verify-15db",
        description="Full +-15 dB verification: engineering, gate stats, "
                    "conditional spectrum, tilt-index effect",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("-i", "--input", required=True)
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--gate_ui", type=float, default=50)
    ap.add_argument("--gate_scale", type=float, default=1.0)
    ap.add_argument("--gate_offset", type=float, default=-61.08)
    ap.add_argument("--hyst_db", type=float, default=1.0)
    ap.add_argument("--up_delay_ms", type=float, default=0)
    ap.add_argument("--fc", type=float, default=1000)
    ap.add_argument("--slope", type=float, default=12)
    ap.add_argument("--c1_low", type=float, default=15.0)
    ap.add_argument("--c1_high", type=float, default=-15.0)
    ap.add_argument("--c2_low", type=float, default=-15.0)
    ap.add_argument("--c2_high", type=float, default=15.0)
    ap.add_argument("--n_fft", type=int, default=4096)
    ap.add_argument("--hop", type=int, default=2048)
    ap.add_argument("--out_prefix", default="verify_15db")
    return ap


def run(args) -> int:
    from tomatis_tpu.verify.verify_15db import verify
    res = verify(args.input, args.output, gate_ui=args.gate_ui,
                 gate_scale=args.gate_scale, gate_offset=args.gate_offset,
                 hyst_db=args.hyst_db, up_delay_ms=args.up_delay_ms,
                 fc=args.fc, slope=args.slope, c1_low=args.c1_low,
                 c1_high=args.c1_high, c2_low=args.c2_low,
                 c2_high=args.c2_high, n_fft=args.n_fft, hop=args.hop,
                 out_prefix=args.out_prefix)
    f_lo, f_hi = res["platform_freqs"]
    print(f"threshold: {res['threshold_dbfs']:.2f} dBFS; platforms "
          f"~{f_lo:.0f} Hz / ~{f_hi:.0f} Hz")
    eng = res["checks"]["engineering"]
    print(f"A. engineering: {'PASS' if eng['pass'] else 'FAIL'} "
          f"(peak {eng['peak']:.4f}, dc {eng['dc_mean']:.6f})")
    st = res["checks"]["gate_stats"]
    print(f"B. gate: C2 {st.get('c2_ratio', 0) * 100:.1f}%  "
          f"switches {st.get('switch_count', 0)}  "
          f"{'PASS' if st['c2_ratio_ok'] and st['jitter_ok'] else 'WARN'}")
    sp = res["checks"]["spectrum"]
    print(f"C. spectrum: RMSE C1 {sp.get('c1_rmse', 0):.2f} / "
          f"C2 {sp.get('c2_rmse', 0):.2f} dB; fc err "
          f"C1 {sp.get('c1_fc_error', 0):.2f} / "
          f"C2 {sp.get('c2_fc_error', 0):.2f} dB; platforms "
          f"C1 {sp.get('c1_low_platform', 0):+.1f}/"
          f"{sp.get('c1_high_platform', 0):+.1f} "
          f"C2 {sp.get('c2_low_platform', 0):+.1f}/"
          f"{sp.get('c2_high_platform', 0):+.1f} dB -> "
          f"{'PASS' if sp['pass'] else 'FAIL'}")
    ti = res["checks"]["tilt_index"]
    print(f"D. tilt index effect (C2-C1): {ti.get('ti_effect', 0):.2f} dB "
          f"{'PASS' if ti.get('effect_ok') else 'WARN (<5dB)'}")
    print(f"overall: {'PASS' if res['pass'] else 'FAIL'}")
    return 0 if res["pass"] else 1


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return run(args)
    except Exception as e:
        import traceback
        print(f"[ERR] {e}")
        traceback.print_exc()
        return 1


if __name__ == "__main__":
    sys.exit(main())
