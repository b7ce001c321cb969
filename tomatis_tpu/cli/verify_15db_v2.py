"""CLI: ±15 dB verifier v2 (parity with ref src/verify_tomatis_15db_v2.py)."""
from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="tomatis verify-15db-v2",
        description="Adaptive-mode +-15 dB verification: auto threshold, "
                    "anchored conditional spectrum, platform/slope RMSE",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("-i", "--input", required=True)
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--hyst_db", type=float, default=1.0)
    ap.add_argument("--up_delay_ms", type=float, default=0)
    ap.add_argument("--target_c2", type=float, default=0.5)
    ap.add_argument("--fc", type=float, default=1000)
    ap.add_argument("--slope", type=float, default=12)
    ap.add_argument("--c1_low", type=float, default=15.0)
    ap.add_argument("--c1_high", type=float, default=-15.0)
    ap.add_argument("--c2_low", type=float, default=-15.0)
    ap.add_argument("--c2_high", type=float, default=15.0)
    ap.add_argument("--n_fft", type=int, default=4096)
    ap.add_argument("--hop", type=int, default=2048)
    ap.add_argument("--level_percentile", type=float, default=10)
    ap.add_argument("--out_prefix", default="verify_15db_v2")
    return ap


def run(args) -> int:
    from tomatis_tpu.verify.verify_15db_v2 import verify_v2
    res = verify_v2(args.input, args.output, hyst_db=args.hyst_db,
                    up_delay_ms=args.up_delay_ms, target_c2=args.target_c2,
                    fc=args.fc, slope=args.slope, c1_low=args.c1_low,
                    c1_high=args.c1_high, c2_low=args.c2_low,
                    c2_high=args.c2_high, n_fft=args.n_fft, hop=args.hop,
                    level_percentile=args.level_percentile,
                    out_prefix=args.out_prefix)
    print(f"auto threshold: {res['auto_threshold_dbfs']:.2f} dBFS "
          f"(C2 {res['achieved_c2_ratio'] * 100:.1f}%)")
    eng = res["checks"]["engineering"]
    print(f"A. engineering: {'PASS' if eng['pass'] else 'FAIL'}")
    sp = res["checks"]["spectrum"]
    print(f"C. spectrum: lo-RMSE C1 {sp.get('c1_lo_platform_rmse', 0):.2f} "
          f"C2 {sp.get('c2_lo_platform_rmse', 0):.2f}; hi-RMSE "
          f"C1 {sp.get('c1_hi_platform_rmse', 0):.2f} "
          f"C2 {sp.get('c2_hi_platform_rmse', 0):.2f}; fc err "
          f"C1 {sp.get('c1_fc_error', 0):.2f} "
          f"C2 {sp.get('c2_fc_error', 0):.2f} -> "
          f"{'PASS' if sp['pass'] else 'FAIL'}")
    ti = res["checks"]["tilt_index"]
    print(f"D. tilt effect: {ti.get('ti_effect', 0):.2f} dB "
          f"{'PASS' if ti.get('effect_ok') else 'WARN'}")
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
