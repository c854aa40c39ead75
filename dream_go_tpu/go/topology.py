"""Static board topology: neighbor tables and D8 symmetry permutations.

TPU-native replacement for the reference's iterator machinery
(`src/libdg_go/iter/*.rs`, `src/libdg_go/point.rs`) and symmetry tables
(`src/libdg_go/utils/symmetry.rs:67-145`): instead of per-point iterators we
precompute dense numpy index tables that jitted gathers use.  Off-board
neighbors use the sentinel index ``NN`` (= 361); arrays that are gathered
through `NBR` are padded with one sentinel element.
"""

from __future__ import annotations

import numpy as np

N = 19
NN = N * N
PASS = NN


def _build_neighbors() -> np.ndarray:
    nbr = np.full((NN, 4), NN, dtype=np.int32)
    for p in range(NN):
        x, y = p % N, p // N
        for k, (dx, dy) in enumerate(((0, -1), (-1, 0), (1, 0), (0, 1))):
            nx, ny = x + dx, y + dy
            if 0 <= nx < N and 0 <= ny < N:
                nbr[p, k] = N * ny + nx
    return nbr


#: [361, 4] neighbor indices (up, left, right, down); NN for off-board.
NBR: np.ndarray = _build_neighbors()

#: [361] iota, handy for chain-id resets.
IOTA: np.ndarray = np.arange(NN, dtype=np.int32)


def _build_neighbors8() -> np.ndarray:
    """[361, 8]: 4 cross then 4 diagonal neighbors; NN for off-board."""
    nbr = np.full((NN, 8), NN, dtype=np.int32)
    offsets = ((1, 0), (-1, 0), (0, 1), (0, -1),
               (1, 1), (1, -1), (-1, 1), (-1, -1))
    for p in range(NN):
        x, y = p % N, p // N
        for k, (dx, dy) in enumerate(offsets):
            nx, ny = x + dx, y + dy
            if 0 <= nx < N and 0 <= ny < N:
                nbr[p, k] = N * ny + nx
    return nbr


#: [361, 8] cross+diagonal neighbors (for the eye heuristic).
NBR8: np.ndarray = _build_neighbors8()


def _build_symmetries() -> np.ndarray:
    """D8 group as gather permutations.

    ``SYM[t]`` satisfies ``transformed_plane = plane[SYM[t]]``, i.e.
    ``SYM[t][dst] = src``.  Order matches the reference's Transform enum
    (`symmetry.rs:67-78`): identity, flipLR, flipUD, transpose,
    anti-transpose(transpose+rot180), rot90, rot180, rot270.
    """
    def idx(fn):
        out = np.empty(NN, dtype=np.int32)
        for dst in range(NN):
            x, y = dst % N, dst // N
            sx, sy = fn(x, y)
            out[dst] = N * sy + sx
        return out

    c = N - 1
    return np.stack([
        idx(lambda x, y: (x, y)),            # identity
        idx(lambda x, y: (c - x, y)),        # flip left-right
        idx(lambda x, y: (x, c - y)),        # flip up-down
        idx(lambda x, y: (y, x)),            # transpose (main diagonal)
        idx(lambda x, y: (c - y, c - x)),    # anti-transpose
        idx(lambda x, y: (y, c - x)),        # rot 90
        idx(lambda x, y: (c - x, c - y)),    # rot 180
        idx(lambda x, y: (c - y, x)),        # rot 270
    ])


#: [8, 361] D8 gather permutations over flat board indices.
SYM: np.ndarray = _build_symmetries()


def _invert(perm: np.ndarray) -> np.ndarray:
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0], dtype=perm.dtype)
    return inv


#: [8, 361] inverse permutations (`symmetry.rs:79` `inverse`).
SYM_INV: np.ndarray = np.stack([_invert(SYM[t]) for t in range(8)])

#: [8, 362] policy-index permutations: pass (361) maps to itself.
SYM_POLICY: np.ndarray = np.concatenate(
    [SYM, np.full((8, 1), PASS, dtype=np.int32)], axis=1)
SYM_POLICY_INV: np.ndarray = np.concatenate(
    [SYM_INV, np.full((8, 1), PASS, dtype=np.int32)], axis=1)
