"""Params sidecar: closing the process -> verify flag loop.

The verifier CLIs deliberately keep the REFERENCE's per-tool defaults,
which differ from the processors' (e.g. validate defaults to hyst 1.0 /
up_delay 0 / gate_offset -61.08 / ±5 dB tilt — ref
src/validate_layer1.py:405-436 — vs the processor's hyst 3.0 /
up_delay 250 / ±15 dB). Driving `validate` correctly after `process`
therefore needs ~10 hand-copied flags.

Each process* CLI now writes `<output>.params.json` — the RESOLVED
configuration, with the gate threshold expressed in the linear
gate_scale/gate_offset form every verifier consumes — and
validate / verify-15db / verify-15db-v2 accept `--params <json>` to
load it. Same closing-the-loop idea as the reference's calibration
JSON round trip (ref src/calibrate_to_baseline_v2.py:288-312), applied
to verification. Precedence: tool defaults < sidecar < explicitly
typed flags; without --params nothing changes.
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def sidecar_path(output_path) -> str:
    return str(output_path) + ".params.json"


def write_sidecar(output_path, tool: str, resolved: dict) -> str:
    """Write `<output>.params.json`. `resolved` keys that match a
    verifier flag dest are applied by --params; extra keys are kept as
    informational record. Failure to write never fails the run."""
    path = sidecar_path(output_path)
    try:
        with open(path, "w", encoding="utf-8") as f:
            json.dump({"tool": tool, **resolved}, f, indent=2,
                      sort_keys=True)
            f.write("\n")
    except OSError as e:
        print(f"warning: params sidecar not written ({e})",
              file=sys.stderr)
    return path


def linear_gate(gate_ui: float, threshold_dbfs: float) -> dict:
    """The linear-form gate triple encoding an already-resolved
    threshold: T = 0 * gate_ui + T for any UI value. Exact for every
    gate_mode, so sidecars are uniform across processors."""
    return {"gate_ui": gate_ui, "gate_scale": 0.0,
            "gate_offset": float(threshold_dbfs),
            "threshold_dbfs": float(threshold_dbfs)}


def add_params_flag(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("--params", default="auto",
                    help="params sidecar (<out>.params.json, written by "
                         "the process* commands): fills every flag you "
                         "did not type explicitly; typed flags win. "
                         "'auto' (default) loads the sidecar next to -o "
                         "when one exists; 'none' disables")


def apply_params(args: argparse.Namespace, build_parser, argv) -> None:
    """Overlay the --params sidecar onto `args` in place.

    Only dests the parser knows AND the user did not explicitly type are
    overwritten, so reference-quirk defaults stay intact without a
    sidecar and any typed flag beats the sidecar.
    """
    p = getattr(args, "params", None)
    if p in (None, "none", ""):
        return
    if p == "auto":
        p = sidecar_path(args.output)
        if not os.path.isfile(p):
            return
    with open(p, "r", encoding="utf-8") as f:
        side = json.load(f)
    args.params = p
    # which dests did the user actually type? Re-parse argv with every
    # default suppressed: only provided options materialize.
    probe = build_parser()
    for act in probe._actions:
        act.default = argparse.SUPPRESS
        act.required = False
    typed, _ = probe.parse_known_args(
        list(sys.argv[1:]) if argv is None else list(argv))
    typed_dests = set(vars(typed))
    known = {a.dest for a in build_parser()._actions}
    applied = []
    for key, val in side.items():
        if key in known and key not in typed_dests and hasattr(args, key):
            setattr(args, key, val)
            applied.append(key)
    if applied:
        print(f"params loaded from {os.path.basename(args.params)}: "
              + ", ".join(sorted(applied)))
