"""Zobrist hashing tables for positional super-ko.

Replaces `src/libdg_go/zobrist.rs` (a 1285-line table of u64 constants) with a
seeded PCG64-generated table.  We represent the 64-bit hash as a pair of
uint32 words so the engine never needs `jax_enable_x64`; all hash arithmetic
is XOR, which distributes over the two words independently.

The table is indexed ``Z[color-1, point, word]`` for color in {BLACK=1,
WHITE=2}.  The empty board hashes to 0 (no entry is XOR'd in), matching the
reference's convention (`src/libdg_go/board.rs` zobrist_hash starts at 0).
"""

from __future__ import annotations

import numpy as np

from .topology import NN

_SEED = 0x20260816


def _build_table() -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(_SEED))
    return rng.integers(0, 2**32, size=(2, NN, 2), dtype=np.uint32)


#: [2, 361, 2] uint32 zobrist entries: [color-1, point, hash-word].
Z: np.ndarray = _build_table()


def hash_of(stones: np.ndarray) -> np.ndarray:
    """Host-side hash of a board (uint32[2]); stones is int8[361] 0/1/2."""
    h = np.zeros(2, dtype=np.uint32)
    for color in (1, 2):
        mask = stones == color
        if mask.any():
            h ^= np.bitwise_xor.reduce(Z[color - 1][mask], axis=0)
    return h
