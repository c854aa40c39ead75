"""Git-style base85 codec for tensor payloads.

Capability parity with the reference codec (`src/libdg_utils/b85.rs`): tensors
are serialized as their little-endian byte stream, grouped into 4-byte words,
each word emitted as 5 digits (big-endian, RFC-1924 alphabet).  This is exactly
the transform implemented by :func:`base64.b85encode`, verified against the
reference's own test vector (``"NJ4Ny"`` == f16 ``[3.140625, 2.71875]``,
`src/libdg_utils/b85.rs:171-179`).

Used for:
- the weights JSON format (``dream_go.json`` tensors, `src/libdg_nn/loader.rs`)
- the per-move policy blobs in self-play SGF output (``P[...]`` properties,
  `src/libdg_mcts/self_play.rs:187-214`)
"""

from __future__ import annotations

import base64

import numpy as np


def encode(array: np.ndarray) -> str:
    """Encode a numpy array (any dtype) to a base85 string.

    f32 inputs are narrowed to f16 first, matching the reference encoder
    (`src/libdg_utils/b85.rs:141-165`).
    """
    array = np.asarray(array)
    if array.dtype == np.float32 or array.dtype == np.float64:
        array = array.astype(np.float16)
    data = array.tobytes()
    if len(data) % 4 != 0:
        raise ValueError(f"b85 payload must be a multiple of 4 bytes, got {len(data)}")
    return base64.b85encode(data).decode("ascii")


def encode_bytes(data: bytes) -> str:
    if len(data) % 4 != 0:
        raise ValueError(f"b85 payload must be a multiple of 4 bytes, got {len(data)}")
    return base64.b85encode(data).decode("ascii")


def decode(text: str, dtype=np.float16) -> np.ndarray:
    """Decode a base85 string into a numpy array of the given dtype."""
    data = base64.b85decode(text.encode("ascii"))
    return np.frombuffer(data, dtype=dtype).copy()


def decode_f16(text: str) -> np.ndarray:
    return decode(text, np.float16)


def decode_f32(text: str) -> np.ndarray:
    return decode(text, np.float32)


def decode_i8(text: str) -> np.ndarray:
    return decode(text, np.int8)


def decode_i32(text: str) -> np.ndarray:
    return decode(text, np.int32)
