"""Params sidecar: the process* CLIs record their resolved config next
to the output; the verifier CLIs auto-load it so the naive
process-then-validate drive passes without hand-copying the ~10 flags
whose per-tool defaults deliberately differ (reference quirk kept —
ref src/validate_layer1.py:405-436). Precedence: tool defaults <
sidecar < explicitly typed flags."""
import json

import numpy as np

from tomatis_tpu.cli import process as cli_process
from tomatis_tpu.cli import validate as cli_validate
from tomatis_tpu.cli._sidecar import apply_params, sidecar_path
from tomatis_tpu.io import audio


def _noise_signal(seconds=8.0, sr=48000, seed=11):
    """Broadband noise with a loud middle (the conditional-spectrum
    check needs broadband content; quiet floor above the -60 dBFS
    stable-frame cutoff, loud low enough that +15 dB keeps peak<0.98)."""
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    x = 0.4 * rng.standard_normal((n, 2))
    amp = np.full(n, 0.005)
    amp[int(2.5 * sr):int(5.5 * sr)] = 0.05
    return np.clip(x * amp[:, None], -0.98, 0.98).astype(np.float32)


def test_process_writes_sidecar_and_naive_validate_passes(tmp_path):
    ip, op, cp = (str(tmp_path / f) for f in ("in.wav", "out.wav", "s.csv"))
    audio.write(ip, _noise_signal(), 48000, subtype="PCM_24")
    rc = cli_process.main(["-i", ip, "-o", op, "--state_csv", cp,
                           "--gate_ui", "50",
                           "--gate_mode", "log_percent"])
    assert rc == 0
    side = json.load(open(sidecar_path(op)))
    # log_percent ui 50 resolves to T = -40 dBFS, recorded in the
    # linear form every verifier consumes
    assert side["gate_scale"] == 0.0
    assert abs(side["gate_offset"] - (-40.0)) < 1e-9
    assert side["up_delay_ms"] == 250.0 and side["hyst_db"] == 3.0
    assert side["c1_low"] == 15.0 and side["tool"] == "process"
    # the naive drive: validate with NO parameter flags must PASS (its
    # own defaults — hyst 1.0, up_delay 0, +-5 dB tilt — would fail)
    rc = cli_validate.main(["-i", ip, "-o", op, "--state_csv", cp,
                            "--out_csv", str(tmp_path / "spec.csv"),
                            "--out_png", str(tmp_path / "spec.png")])
    assert rc == 0


def test_sidecar_precedence_and_absence(tmp_path):
    side_file = tmp_path / "x.params.json"
    side_file.write_text(json.dumps(
        {"tool": "process", "gate_offset": -40.0, "gate_scale": 0.0,
         "hyst_db": 3.0, "up_delay_ms": 250.0, "c1_low": 15.0,
         "not_a_flag": 123}))

    def parse(argv):
        args = cli_validate.build_parser().parse_args(argv)
        apply_params(args, cli_validate.build_parser, argv)
        return args

    base = ["-i", "a", "-o", "b", "--state_csv", "c"]
    # no sidecar next to -o, no --params: reference defaults intact
    args = parse(base)
    assert args.gate_offset == -61.08 and args.hyst_db == 1.0
    assert args.up_delay_ms == 0 and args.c1_low == 5.0
    # explicit --params: sidecar fills untyped flags, skips unknown keys
    args = parse(base + ["--params", str(side_file)])
    assert args.gate_offset == -40.0 and args.gate_scale == 0.0
    assert args.hyst_db == 3.0 and args.up_delay_ms == 250.0
    assert args.c1_low == 15.0
    assert not hasattr(args, "not_a_flag")
    # a typed flag beats the sidecar; untyped ones still load
    args = parse(base + ["--params", str(side_file), "--hyst_db", "2.5"])
    assert args.hyst_db == 2.5 and args.gate_offset == -40.0
    # --params none disables even when a file exists
    args = parse(base + ["--params", "none"])
    assert args.gate_offset == -61.08


def test_auto_detection_only_when_sidecar_exists(tmp_path):
    out = tmp_path / "out.wav"
    argv = ["-i", "a", "-o", str(out), "--state_csv", "c"]
    args = cli_validate.build_parser().parse_args(argv)
    apply_params(args, cli_validate.build_parser, argv)
    assert args.hyst_db == 1.0  # nothing next to -o: defaults intact
    (tmp_path / "out.wav.params.json").write_text(
        json.dumps({"hyst_db": 3.0}))
    args = cli_validate.build_parser().parse_args(argv)
    apply_params(args, cli_validate.build_parser, argv)
    assert args.hyst_db == 3.0  # auto-loaded


def test_xfade_and_adaptive_sidecars(tmp_path):
    from tomatis_tpu.cli import process_adaptive, process_xfade
    ip = str(tmp_path / "in.wav")
    audio.write(ip, _noise_signal(4.0), 48000, subtype="PCM_24")
    ox = str(tmp_path / "ox.wav")
    rc = process_xfade.main(["-i", ip, "-o", ox, "--xfade_ms", "80",
                             "--gate_ui", "40", "--gate_offset", "-61.08",
                             "--allow_any_rate"])
    assert rc == 0
    side = json.load(open(sidecar_path(ox)))
    assert side["tool"] == "process-xfade" and side["xfade_ms"] == 80.0
    assert abs(side["gate_offset"] - (40 * 1.0 - 61.08)) < 1e-9

    oa = str(tmp_path / "oa.wav")
    rc = process_adaptive.main(["-i", ip, "-o", oa])
    assert rc == 0
    side = json.load(open(sidecar_path(oa)))
    assert side["tool"] == "process-adaptive"
    assert side["target_c2"] == 0.5 and "optimal_threshold_dbfs" in side
    # no linear gate triple: validate's up-delay recompute cannot
    # reproduce the adaptive min-hold gate
    assert "gate_offset" not in side
