"""Pallas kernel: exact liberties-after-move for all candidates, both colors.

The dominant cost of V1 feature extraction (planes 12-17 / 24-29,
`features.rs:104-148`) is the all-candidates `get_n_liberty_if`
(`board_fast.rs:484-539`).  The XLA formulation (`go/features.py`) moves
[B,361,361] one-hots and matmul operands through HBM; this kernel keeps the
whole computation in VMEM per board: membership matrix, neighbor adjacency by
rolls, two MXU matmuls (common-own-chain reach, captured-stone membership),
and the final open-and-reach reduction.

Counting identity (same as `go/features.py::liberties_if`):

    libs_if[p] = sum_e  [e != p]
                 * (empty[e] OR e is captured by playing p)
                 * (e adjacent to p OR e touches an own chain adjacent to p)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..go import engine as goe
from ..go.topology import NN

NP = 384
N = 19

_IDX = np.arange(NP)
_VALID = (_IDX < NN)
_MASKS = {
    +1: (_VALID & (_IDX % N > 0)),
    -1: (_VALID & (_IDX % N < N - 1)),
    +N: (_VALID & (_IDX >= N)),
    -N: (_VALID & (_IDX + N < NN)),
}
_SHIFTS = (1, -1, N, -N)


def _roll(x, shift, axis):
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _kernel(consts_ref, stones_ref, cid_ref, out_ref):
    valid = consts_ref[0:1, :] > 0                      # [1, NP]
    stones = stones_ref[0, 0:1, :]                      # i32 [1, NP]
    cid = cid_ref[0, 0:1, :]
    empty = ((stones == 0) & valid).astype(jnp.float32)

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (NP, NP), 1)
    stonep = ((stones > 0) & valid).astype(jnp.int32).reshape(NP, 1)
    m = jnp.where((iota_c == cid.reshape(NP, 1)) & (stonep > 0), 1.0, 0.0)

    # adjacency-of-point matrix (p adjacent to e) and chain adjacency
    ident = jnp.where(
        iota_c == jax.lax.broadcasted_iota(jnp.int32, (NP, NP), 0), 1.0, 0.0)
    adjmat = jnp.zeros((NP, NP), jnp.float32)
    adj_chain = jnp.zeros((NP, NP), jnp.float32)        # [e, c] e touches c
    for s in _SHIFTS:
        mk = consts_ref[{1: 1, -1: 2, N: 3, -N: 4}[s]:{1: 1, -1: 2, N: 3,
                                                       -N: 4}[s] + 1, :] \
            .astype(jnp.float32).reshape(NP, 1)
        adjmat = jnp.maximum(adjmat, _roll(ident, s, 0) * mk)
        adj_chain = jnp.maximum(adj_chain, _roll(m, s, 0) * mk)

    chain_libs = jnp.sum(adj_chain * empty.reshape(NP, 1), axis=0) \
        .reshape(1, NP)                                  # [1, c]
    libs1 = (chain_libs == 1.0).astype(jnp.float32)      # [1, c]

    # per-point liberty count (one-hot matvec) + pseudo-legality per color
    pl_q = jnp.dot(m, chain_libs.reshape(NP, 1),
                   preferred_element_type=jnp.float32).reshape(1, NP)
    out_ref[0, 2:3, :] = pl_q.astype(jnp.int32)

    stones_f = stones.astype(jnp.float32)
    mask_row = {1: 1, -1: 2, N: 3, -N: 4}
    nbr = []
    for s in _SHIFTS:
        mk = consts_ref[mask_row[s]:mask_row[s] + 1, :] > 0
        nbr.append((jnp.where(mk, _roll(stones_f, s % NP, 1), 3.0),
                    jnp.where(mk, _roll(pl_q, s % NP, 1), 0.0)))
    for color in (1, 2):
        cf = float(color)
        of = float(3 - color)
        has_empty = jnp.zeros((1, NP), bool)
        own_ok = jnp.zeros((1, NP), bool)
        cap_ok = jnp.zeros((1, NP), bool)
        for st_k, pl_k in nbr:
            has_empty |= st_k == 0.0
            own_ok |= (st_k == cf) & (pl_k >= 2.0)
            cap_ok |= (st_k == of) & (pl_k == 1.0)
        pseudo = (empty > 0) & (has_empty | own_ok | cap_ok)
        out_ref[0, 2 + color:3 + color, :] = pseudo.astype(jnp.int32)

    for color in (1, 2):
        own_col = ((stones == color) & valid).astype(jnp.float32) \
            .reshape(NP, 1)
        opp_col = ((stones == (3 - color)) & valid).astype(jnp.float32) \
            .reshape(NP, 1)

        member_own = m * own_col                         # [q, c]
        own_adj = jnp.zeros((NP, NP), jnp.float32)       # [x, c]
        for s in _SHIFTS:
            mk = consts_ref[{1: 1, -1: 2, N: 3, -N: 4}[s]:
                            {1: 1, -1: 2, N: 3, -N: 4}[s] + 1, :] \
                .astype(jnp.float32).reshape(NP, 1)
            own_adj = jnp.maximum(own_adj, _roll(member_own, s, 0) * mk)

        # match[p, e] = p and e touch a common own chain
        match = jnp.dot(own_adj, own_adj.T,
                        preferred_element_type=jnp.float32)

        member_cap = m * opp_col * libs1                 # [q, c] captured
        cap_adj = jnp.zeros((NP, NP), jnp.float32)
        for s in _SHIFTS:
            mk = consts_ref[{1: 1, -1: 2, N: 3, -N: 4}[s]:
                            {1: 1, -1: 2, N: 3, -N: 4}[s] + 1, :] \
                .astype(jnp.float32).reshape(NP, 1)
            cap_adj = jnp.maximum(cap_adj, _roll(member_cap, s, 0) * mk)
        # cap_member[p, e] = stone e is in a chain captured by playing p
        cap_member = jnp.dot(cap_adj, member_cap.T,
                             preferred_element_type=jnp.float32)

        open_after = jnp.maximum(empty, jnp.minimum(cap_member, 1.0))
        reach = jnp.maximum(adjmat, jnp.minimum(match, 1.0))
        nodiag = 1.0 - ident
        count = jnp.sum(open_after * reach * nodiag, axis=1).reshape(1, NP)
        out_ref[0, color - 1:color, :] = count.astype(jnp.int32)
    out_ref[0, 5:8, :] = jnp.zeros((3, NP), jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def liberties_after_both(states: goe.GoState, interpret: bool | None = None):
    """(libs_if_black, libs_if_white): int32[B, 361] exact counts.

    Values at non-pseudo-legal points are meaningless; mask upstream (the
    feature planes do).
    """
    if interpret is None:  # run anywhere: interpret on CPU (hermetic tests)
        interpret = jax.default_backend() == "cpu"
    b = states.stones.shape[0]
    pad = lambda x, fill: jnp.concatenate(
        [x, jnp.full((b, NP - x.shape[1]), fill, x.dtype)], axis=1)
    stones = pad(states.stones.astype(jnp.int32), 0)[:, None, :]
    cid = pad(states.chain_id, 0)[:, None, :]
    consts = jnp.asarray(np.stack(
        [_VALID, _MASKS[1], _MASKS[-1], _MASKS[N], _MASKS[-N],
         np.zeros(NP, bool), np.zeros(NP, bool), np.zeros(NP, bool)])
        .astype(np.int32))

    out = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((8, NP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, NP), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, NP), jnp.int32),
        interpret=interpret,
    )(consts, stones, cid)
    return out[:, 0, :NN], out[:, 1, :NN]


@functools.partial(jax.jit, static_argnames=("interpret",))
def board_features_raw(states: goe.GoState, interpret: bool | None = None):
    """One kernel pass -> dict of per-point feature ingredients:
    libs_if_black/white, point_libs, pseudo_black/white (int32[B, 361])."""
    if interpret is None:  # run anywhere: interpret on CPU (hermetic tests)
        interpret = jax.default_backend() == "cpu"
    b = states.stones.shape[0]
    pad = lambda x, fill: jnp.concatenate(
        [x, jnp.full((b, NP - x.shape[1]), fill, x.dtype)], axis=1)
    stones = pad(states.stones.astype(jnp.int32), 0)[:, None, :]
    cid = pad(states.chain_id, 0)[:, None, :]
    consts = jnp.asarray(np.stack(
        [_VALID, _MASKS[1], _MASKS[-1], _MASKS[N], _MASKS[-N],
         np.zeros(NP, bool), np.zeros(NP, bool), np.zeros(NP, bool)])
        .astype(np.int32))
    out = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((8, NP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, NP), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, NP), jnp.int32),
        interpret=interpret,
    )(consts, stones, cid)
    return dict(
        libs_if_black=out[:, 0, :NN], libs_if_white=out[:, 1, :NN],
        point_libs=out[:, 2, :NN],
        pseudo_black=out[:, 3, :NN] > 0, pseudo_white=out[:, 4, :NN] > 0)
