"""PCM_24 byte <-> int32 converters (numpy only — NO jax import).

These are the byte-level primitives shared by every PCM_24 path: the WAV
and FLAC readers/writers, the wire codec's raw escape, and the stream
drivers' write_raw sinks. They live here, outside tomatis_tpu.ops, so
that pure host-side I/O (reading a WAV, decoding a FLAC) never imports
jax: the analysis and verification CLIs must be able to read audio while
another process owns the TPU, and a plain file read must never pay a
backend attach.
"""
from __future__ import annotations

import numpy as np


def i32_from_le24(b: np.ndarray) -> np.ndarray:
    """3-byte little-endian PCM_24 -> sign-extended int32 [n]. One
    memcpy into the top 3 bytes of an i32 plus one arithmetic shift
    (about 2x faster than or-ing the bytes together)."""
    b = np.ascontiguousarray(b, np.uint8).reshape(-1, 3)
    v = np.zeros(b.shape[0], "<i4")
    v.view(np.uint8).reshape(-1, 4)[:, 1:] = b
    v >>= 8
    return v


def le24_from_i32(v: np.ndarray) -> np.ndarray:
    """int32 [n] (values in 24-bit range) -> flat uint8 [3n]
    little-endian: the low 3 bytes of each little-endian i32."""
    v = np.ascontiguousarray(v, "<i4").reshape(-1)
    return np.ascontiguousarray(
        v.view(np.uint8).reshape(-1, 4)[:, :3]).reshape(-1)
