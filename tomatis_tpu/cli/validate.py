"""CLI: Layer-1 validator (parity with ref src/validate_layer1.py:405-436;
defaults are the reference's production-calibrated values)."""
from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="tomatis validate",
        description="Layer-1 validation: gate recomputation + filter shape "
                    "+ engineering checks",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("-i", "--input", required=True, help="original input")
    ap.add_argument("-o", "--output", required=True, help="processed output")
    ap.add_argument("--state_csv", required=True)
    ap.add_argument("--gate_ui", type=float, default=50)
    ap.add_argument("--gate_scale", type=float, default=1.0)
    ap.add_argument("--gate_offset", type=float, default=-61.08)
    ap.add_argument("--hyst_db", type=float, default=1.0)
    ap.add_argument("--up_delay_ms", type=float, default=0)
    ap.add_argument("--fc", type=float, default=1000)
    ap.add_argument("--slope", type=float, default=12)
    ap.add_argument("--c1_low", type=float, default=5.0)
    ap.add_argument("--c1_high", type=float, default=-5.0)
    ap.add_argument("--c2_low", type=float, default=-5.0)
    ap.add_argument("--c2_high", type=float, default=5.0)
    ap.add_argument("--n_fft", type=int, default=4096)
    ap.add_argument("--hop", type=int, default=2048)
    ap.add_argument("--out_csv", default="layer1_spectrum_check.csv")
    ap.add_argument("--out_png", default="layer1_spectrum_check.png")
    return ap


def run(args) -> int:
    from tomatis_tpu.verify.validate_layer1 import BANDS, validate
    res = validate(args.input, args.output, args.state_csv,
                   gate_ui=args.gate_ui, gate_scale=args.gate_scale,
                   gate_offset=args.gate_offset, hyst_db=args.hyst_db,
                   up_delay_ms=args.up_delay_ms, fc=args.fc,
                   slope=args.slope, c1_low=args.c1_low,
                   c1_high=args.c1_high, c2_low=args.c2_low,
                   c2_high=args.c2_high, n_fft=args.n_fft, hop=args.hop,
                   out_csv=args.out_csv, out_png=args.out_png)
    eng = res["checks"]["engineering"]
    print("A. engineering")
    print(f"  sr: {eng['sr_in']} -> {eng['sr_out']} "
          f"{'PASS' if eng['sr_match'] else 'FAIL'}")
    print(f"  channels: {eng['ch_in']} -> {eng['ch_out']} "
          f"{'PASS' if eng['ch_match'] else 'FAIL'}")
    print(f"  samples: {eng['frames_in']} -> {eng['frames_out']} "
          f"(diff={eng['frames_diff']}) "
          f"{'PASS' if eng['frames_match'] else 'FAIL'}")
    print(f"  peak: {eng['peak']:.4f} "
          f"{'PASS' if eng['peak_safe'] else 'FAIL (>=0.98)'}")
    g = res["checks"]["gate"]
    print("B. gate recomputation")
    print(f"  frames: {g['total_frames']}  mismatch: {g['mismatch_count']} "
          f"({g['mismatch_rate'] * 100:.2f}%)")
    print(f"  level diff: max {g['level_max_diff']:.4f} dB, "
          f"mean {g['level_mean_diff']:.4f} dB")
    print(f"  switches: csv={g['csv_switches']} sim={g['sim_switches']}")
    print(f"  result: "
          f"{'PASS' if g['pass'] else 'FAIL (mismatch>1% or level>0.1dB)'}")
    s = res["checks"]["gate_stats"]
    print("C. gate statistics")
    print(f"  C2 ratio: {s['c2_ratio'] * 100:.1f}%  "
          f"switches: {s['switch_count']}  "
          f"short-run ratio: {s['short_run_ratio'] * 100:.1f}%")
    print(f"  C2 range: {'PASS' if s['c2_ratio_ok'] else 'WARN (extreme)'}"
          f"  jitter: {'PASS' if s['jitter_ok'] else 'WARN (short runs)'}")
    sp = res["checks"]["spectrum"]
    print("D. conditional spectrum")
    print(f"  stable frames: C1={sp['c1_frames']}, C2={sp['c2_frames']}")
    for (name, lo, hi), r1, r2 in zip(BANDS, sp["c1_rmse"], sp["c2_rmse"]):
        print(f"  {name} ({lo}-{hi}Hz): C1 {r1:.2f} dB, C2 {r2:.2f} dB")
    print(f"  result: {'PASS' if sp['pass'] else 'FAIL (RMSE >= 1.5 dB)'}")
    print()
    print(f"Layer1 validation: {'PASS' if res['pass'] else 'FAIL'}")
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
