"""CLI: environment verifier (capability parity with
ref src/test_environment.py + src/test_audio.py): dependency imports,
codec round trip, device inventory, STFT smoke test, engine smoke test."""
from __future__ import annotations

import argparse
import sys
import tempfile


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="tomatis doctor",
        description="Verify the runtime environment end to end")
    ap.add_argument("--skip_device", action="store_true",
                    help="skip the accelerator checks")
    ap.add_argument("--device_timeout", type=float, default=60.0,
                    help="seconds to wait for the backend attach before "
                         "reporting the link as down (default 60)")
    args = ap.parse_args(argv)
    ok = True

    def check(name, fn):
        nonlocal ok
        try:
            detail = fn()
            print(f"[OK]   {name}" + (f": {detail}" if detail else ""))
        except Exception as e:
            ok = False
            print(f"[FAIL] {name}: {e}")

    def imports():
        import jax
        import numpy
        import scipy
        return (f"jax {jax.__version__}, numpy {numpy.__version__}, "
                f"scipy {scipy.__version__}")

    check("imports (jax/numpy/scipy)", imports)

    def optional():
        mods = []
        for m in ("pandas", "matplotlib"):
            try:
                __import__(m)
                mods.append(m)
            except ImportError:
                pass
        return ", ".join(mods) or "none"

    check("optional (pandas/matplotlib)", optional)

    def devices():
        if args.skip_device:
            return "skipped"
        # time-boxed: attaching a tunneled accelerator can hang for many
        # minutes when the link is down — an environment CHECK must
        # report that, not reproduce it. The probe thread is a daemon;
        # if it is still stuck at process exit it dies with the process.
        import threading
        res: dict = {}

        def probe():
            try:
                import jax
                devs = jax.devices()
                res["ok"] = f"{len(devs)} x {devs[0].platform}: {devs[0]}"
            except Exception as e:  # pragma: no cover - backend-specific
                res["err"] = e

        t = threading.Thread(target=probe, daemon=True)
        t.start()
        t.join(timeout=args.device_timeout)
        if t.is_alive():
            raise TimeoutError(
                f"no backend after {args.device_timeout:.0f}s — the "
                "accelerator link may be down (rerun with --skip_device "
                "or TOMATIS_PLATFORM=cpu)")
        if "err" in res:
            raise res["err"]
        return res["ok"]

    check("jax devices", devices)

    def codecs():
        import numpy as np
        from tomatis_tpu.io import audio
        x = (0.1 * np.sin(2 * np.pi * 440 * np.arange(4800) / 48000))
        x = np.stack([x, x], 1).astype(np.float32)
        import os
        d = tempfile.mkdtemp()
        for ext in ("wav", "flac"):
            p = os.path.join(d, f"t.{ext}")
            audio.write(p, x, 48000, subtype="PCM_24")
            y, sr = audio.read(p)
            assert sr == 48000 and y.shape == x.shape
            assert float(np.max(np.abs(y - x))) < 2e-7
        return "WAV + native FLAC round trips"

    check("audio codecs", codecs)

    def wire():
        import numpy as np
        from tomatis_tpu.io import wirecodec
        rng = np.random.default_rng(0)
        v = rng.integers(-100000, 100000, (5000, 2)).astype(np.int32)
        buf = wirecodec.encode_i32(v)
        assert np.array_equal(wirecodec.decode_i32(buf, 5000, 2), v)
        native = "native" if wirecodec.available() else "numpy fallback"
        return (f"{native}, {len(buf) / (v.size * 3):.2f}x of raw PCM_24 "
                "round trip")

    check("wire link codec", wire)

    def stft_smoke():
        import numpy as np
        import jax
        import jax.numpy as jnp
        from tomatis_tpu.ops import dsp, stft
        sr, n_fft, hop = 48000, 1024, 512
        t = np.arange(sr) / sr
        x = np.stack([np.sin(2 * np.pi * 440 * t)] * 2, 1).astype(np.float32)
        F = stft.num_frames(len(x), n_fft, hop)
        win = stft.hann_symmetric(n_fft)

        # one jitted graph, like all product code: some backends (the
        # tunneled axon TPU) only implement compiled execution, not
        # eager op-by-op dispatch
        @jax.jit
        def smoke(sig, w):
            fr = stft.frame_signal(sig, n_fft, hop, F)
            lv = dsp.frame_levels_dbfs(jnp.transpose(fr, (0, 2, 1)))
            spec = jnp.abs(jnp.fft.rfft(fr[2, 0] * w))
            return lv, jnp.argmax(spec)

        lv, peak_bin = smoke(x, win)
        peak_bin = int(np.asarray(peak_bin))
        f_peak = peak_bin * sr / n_fft
        assert abs(f_peak - 440) < sr / n_fft
        assert abs(float(np.asarray(lv)[2]) - (-3.0)) < 0.5
        return f"440 Hz sine -> bin {peak_bin} ({f_peak:.0f} Hz)"

    check("STFT smoke test", stft_smoke)

    def engine_smoke():
        import numpy as np
        from tomatis_tpu.models.standard import StandardParams, process_array
        x = (0.05 * np.random.default_rng(0).standard_normal((48000, 2))
             ).astype(np.float32)
        y, stats = process_array(x, 48000,
                                 StandardParams(require_48k_stereo=False),
                                 frames_per_chunk=16)
        assert y.shape == x.shape
        return f"{stats['n_frames']} frames processed"

    check("streaming engine", engine_smoke)

    print()
    print("environment " + ("OK" if ok else "NOT OK"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
