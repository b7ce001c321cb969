"""CLI: container conversion (`tomatis convert`).

The reference leans on an externally installed ffmpeg for WAV<->FLAC
conversion (scripts/setup_ffmpeg.ps1; the WAV-fallback hint at
src/process_tomatis.py:246-249 tells the user to run it by hand). This
framework carries its own codecs (tomatis_tpu/io/), so the conversion
the hints ask for is a subcommand instead of an external dependency.

Streams in 30 s blocks (bounded memory on hour-long files). When both
ends speak PCM_24 the samples ride raw 24-bit bytes end to end —
bit-exact and float-free; otherwise the float32 path is still exact for
PCM_24 payloads (24-bit ints are representable) and rounds once for
narrower targets.
"""
from __future__ import annotations

import argparse
import sys

_BLOCK = 48000 * 30


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        "tomatis convert",
        description="convert audio between the framework's containers "
                    "(WAV/FLAC), replacing the reference's ffmpeg hint")
    ap.add_argument("-i", "--input", required=True)
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--subtype", default="PCM_24",
                    choices=("PCM_16", "PCM_24", "PCM_32", "FLOAT"),
                    help="output sample format (FLAC supports PCM_16/24)")
    args = ap.parse_args(argv)

    from tomatis_tpu.io import audio
    from tomatis_tpu.utils.pcm import le24_from_i32

    with audio.AudioFile(args.input, "r") as fin:
        with audio.AudioFile(args.output, "w", samplerate=fin.samplerate,
                             channels=fin.channels,
                             subtype=args.subtype) as fout:
            lossless = fin.int24_readable and fout.supports_raw
            total = 0
            while True:
                if lossless:
                    v = fin.read_int24(_BLOCK)
                    if len(v) == 0:
                        break
                    fout.write_raw(le24_from_i32(v.reshape(-1)))
                    total += len(v)
                else:
                    x = fin.read(_BLOCK)
                    if len(x) == 0:
                        break
                    fout.write(x)
                    total += len(x)
        sr = fin.samplerate
    path_mode = "raw 24-bit copy" if lossless else "float32"
    print(f"{args.input} -> {args.output}: {total} samples/ch @ {sr} Hz, "
          f"{args.subtype} ({path_mode})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
