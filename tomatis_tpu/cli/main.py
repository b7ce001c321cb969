"""Unified CLI dispatcher: `python -m tomatis_tpu.cli.main <command> ...`.

One binary replacing the reference's 34 standalone scripts; each subcommand
keeps its reference-compatible flags. Commands are loaded lazily so `--help`
stays fast and JAX is only imported by commands that compute.
"""
from __future__ import annotations

import importlib
import os
import sys

COMMANDS = {
    "process": ("tomatis_tpu.cli.process",
                "standard gate-controlled C1/C2 tilt processor"),
    "process-xfade": ("tomatis_tpu.cli.process_xfade",
                      "processor with crossfade state transitions"),
    "process-adaptive": ("tomatis_tpu.cli.process_adaptive",
                         "adaptive processor (auto threshold, min-hold, "
                         "crossfade, headroom)"),
    "process-sharded": ("tomatis_tpu.cli.process_sharded",
                        "standard processor sharded over a multi-chip "
                        "device mesh (sequence-parallel)"),
    "apply-eq": ("tomatis_tpu.cli.apply_eq",
                 "apply a static EQ curve CSV (layer 2)"),
    "apply-residual-eq": ("tomatis_tpu.cli.apply_residual_eq",
                          "apply clamped residual EQ from diff_spectrum.csv "
                          "(layer 2b, --safe for Safe-B)"),
    "declick": ("tomatis_tpu.cli.repair",
                "detect and inpaint clicks/pops"),
    "cut": ("tomatis_tpu.cli.cut", "trim the first N seconds"),
    "validate": ("tomatis_tpu.cli.validate",
                 "layer-1 validation (gate recomputation, filter shape, "
                 "engineering)"),
    "calibrate": ("tomatis_tpu.cli.calibrate",
                  "fit gate params to a device recording (v1)"),
    "calibrate-v2": ("tomatis_tpu.cli.calibrate_v2",
                     "fit gate params + gain to a device recording (v2)"),
    "analyze-eq": ("tomatis_tpu.cli.analyze_eq",
                   "derive the layer-2 static EQ curve (base - target)"),
    "compare": ("tomatis_tpu.cli.compare",
                "pairwise comparison: band deltas, SNR, diff_spectrum.csv"),
    "verify-15db": ("tomatis_tpu.cli.verify_15db",
                    "full +-15 dB verification suite"),
    "verify-15db-v2": ("tomatis_tpu.cli.verify_15db_v2",
                       "adaptive-mode verification (auto threshold)"),
    "verify-tilt": ("tomatis_tpu.cli.verify_tilt",
                    "measure realized tilt amplitude by level grouping"),
    "analyze-dbfs": ("tomatis_tpu.cli.analyzers",
                     "RMS dBFS distribution / gate_ui suggestions",
                     "dbfs_main"),
    "analyze-gate-threshold": ("tomatis_tpu.cli.analyzers",
                               "estimate device gate threshold from "
                               "dBFS CSVs", "gate_threshold_main"),
    "analyze-stereo": ("tomatis_tpu.cli.analyzers",
                       "per-channel threshold + min-hold gate CSV",
                       "stereo_main"),
    "compare-dbfs": ("tomatis_tpu.cli.analyzers",
                     "align recordings and emit frame-dBFS track CSVs",
                     "compare_dbfs_main"),
    "merge-state-volume": ("tomatis_tpu.cli.analyzers",
                           "join state CSV with per-channel dBFS",
                           "merge_main"),
    "inspect": ("tomatis_tpu.cli.analyzers",
                "amplitude profile with ASCII bars + plot", "inspect_main"),
    "inspect-transition": ("tomatis_tpu.cli.analyzers",
                           "100ms dBFS table of a window",
                           "transition_main"),
    "find-segment": ("tomatis_tpu.cli.analyzers",
                     "find the main music segment", "find_segment_main"),
    "find-start": ("tomatis_tpu.cli.analyzers",
                   "smart music-start detection", "find_start_main"),
    "find-end": ("tomatis_tpu.cli.analyzers",
                 "smart music-end detection", "find_end_main"),
    "compare-baseline": ("tomatis_tpu.cli.compare_suite",
                         "multi-candidate baseline comparison report",
                         "baseline_main"),
    "compare-three": ("tomatis_tpu.cli.compare_suite",
                      "Welch-spectrum + envelope comparison", "three_main"),
    "compare-diff-spectrum": ("tomatis_tpu.cli.compare_suite",
                              "RMS-gated diff spectrum on a log-f grid",
                              "diff_spectrum_main"),
    "plot-diff": ("tomatis_tpu.cli.compare_suite",
                  "plot a diff-spectrum CSV", "plot_main"),
    "reverse-engineer": ("tomatis_tpu.cli.reverse",
                         "reverse-engineer device gate/tilt parameters"),
    "convert": ("tomatis_tpu.cli.convert",
                "convert audio between WAV/FLAC (replaces the "
                "reference's ffmpeg conversion hint)"),
    "doctor": ("tomatis_tpu.cli.doctor",
               "verify the runtime environment end to end"),
    "process-batch": ("tomatis_tpu.cli.process_batch",
                      "process many files per device dispatch "
                      "(per-file failure isolation)"),
    "match": ("tomatis_tpu.cli.match",
              "full device-matching workflow in one command "
              "(calibrate + process + layer2 + residual)"),
}


def _pin_platform() -> None:
    """Honor TOMATIS_PLATFORM=cpu|tpu|... BEFORE any jax work.

    Hosts that force-register an accelerator plugin may also override
    jax's platform config at interpreter start, in which case the
    standard JAX_PLATFORMS env var is silently ignored; the config
    update wins over both. Lets analysis tools run on CPU while another
    process owns the (possibly slow-to-attach) accelerator."""
    plat = os.environ.get("TOMATIS_PLATFORM")
    if not plat:
        return
    os.environ["JAX_PLATFORMS"] = plat
    try:
        import jax
        jax.config.update("jax_platforms", plat)
    except Exception as e:  # unknown platform: fail at first use, not here
        print(f"warning: TOMATIS_PLATFORM={plat!r} not applied: {e}",
              file=sys.stderr)


def main(argv=None) -> int:
    if argv is None:
        # real process entry (console script / python -m), not an
        # in-process call from tests: pin the hash seed by re-exec so
        # persistent compile-cache keys match across sessions
        from tomatis_tpu.utils.jaxcache import pin_hash_seed
        pin_hash_seed(["-m", "tomatis_tpu.cli.main"] + sys.argv[1:])
    _pin_platform()
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: tomatis <command> [options]\n\ncommands:")
        for name, spec in sorted(COMMANDS.items()):
            print(f"  {name:24s} {spec[1]}")
        return 0
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command: {cmd!r} (see --help)")
        return 2
    spec = COMMANDS[cmd]
    mod = importlib.import_module(spec[0])
    entry = getattr(mod, spec[2]) if len(spec) > 2 else mod.main
    return entry(argv[1:])


if __name__ == "__main__":
    sys.exit(main())
