"""Fused Pallas TPU kernel for one MCTS leaf expansion.

The per-simulation hot path outside the network is: play the selected action
on the parent board, then extract the 32 V1 feature planes and the legality
mask of the resulting leaf (`search.py` select -> step -> features -> masks).
The XLA formulation moves [B,361,361]-class intermediates through HBM three
separate times (env step, liberties-after kernel, super-ko masks); this
kernel runs the whole thing in VMEM per board, one grid step per game:

- phase A applies the given action (capture/merge/hash/ring update), the
  same board mechanics as `ops/env_step.py` but with the move supplied by
  tree select instead of sampled;
- phase B computes every V1 plane (`features.rs:104-148`) plus the
  StandardSearch candidate mask for the *new* position: chain liberties via
  one membership matvec, liberties-after-move for both colors via the
  counting identity of `ops/libs_after.py` (bf16 MXU matmuls, exact for 0/1
  operands with f32 accumulation), super-ko candidate hashes against the
  updated ring, pseudo-legality for both colors.

Ladder planes (30/31) are left zero here; the XLA ladder reader fills them
when ``ladder_features`` is on.

State layout matches `ops/env_step.py` (`pack_states`); the search keeps its
tree-resident board states in this layout (narrowed dtypes) so there is no
per-simulation pack/unpack — see `mcts/search.py::PackedStates`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..go.topology import NN
from .env_step import _MASK, _SHIFTS, _VALID, _ZB, _ZW, NP, RING, _roll

N = 19
_MASK_ROW = {1: 1, -1: 2, N: 3, -N: 4}


def _nbr_tables(consts_ref, rows):
    """Roll each [1, NP] row in ``rows`` into the 4 neighbor directions.

    Returns a list of 4 tuples (one per direction) of the rolled rows, with
    off-board lanes replaced by the per-row fill value.
    """
    out = []
    for s in _SHIFTS:
        mk = consts_ref[_MASK_ROW[s]:_MASK_ROW[s] + 1, :] > 0
        out.append(tuple(jnp.where(mk, _roll(row, s, 1), fill)
                         for row, fill in rows) + (mk,))
    return out


def _chain_stats(consts_ref, stones, cid):
    """(m, chain_libs, pl_q): membership [NP, NP] f32, per-chain liberty
    counts [1, NP] f32, per-point liberty counts [1, NP] f32."""
    valid = consts_ref[0:1, :] > 0
    empty = ((stones == 0) & valid).astype(jnp.float32)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (NP, NP), 1)
    stonep = ((stones > 0) & valid).astype(jnp.int32).reshape(NP, 1)
    m = jnp.where((iota_c == cid.reshape(NP, 1)) & (stonep > 0), 1.0, 0.0)

    adj_chain = jnp.zeros((NP, NP), jnp.float32)      # [e, c]: e touches c
    for s in _SHIFTS:
        mk = consts_ref[_MASK_ROW[s]:_MASK_ROW[s] + 1, :] \
            .astype(jnp.float32).reshape(NP, 1)
        adj_chain = jnp.maximum(adj_chain, _roll(m, s, 0) * mk)
    chain_libs = jnp.sum(adj_chain * empty.reshape(NP, 1), axis=0) \
        .reshape(1, NP)
    pl_q = jnp.dot(m, chain_libs.reshape(NP, 1),
                   preferred_element_type=jnp.float32).reshape(1, NP)
    return m, chain_libs, pl_q


def _kernel(consts_ref, zob_ref, stones_ref, cid_ref, cxp_ref, hist_ref,
            meta_ref, hash_ref, act_ref, komi_ref,
            stones_o, cid_o, cxp_o, hist_o, meta_o, hash_o, feat_o, cand_o):
    stones = stones_ref[0, 0:1, :]                  # i32 [1, NP]
    cid = cid_ref[0, 0:1, :]
    cxp0 = cxp_ref[0, 0:1, :]
    cxp1 = cxp_ref[0, 1:2, :]
    h0 = hash_ref[0, 0, 0]
    h1 = hash_ref[0, 0, 1]
    to_move = meta_ref[0, 0, 0]
    placed = meta_ref[0, 0, 1]
    move_count = meta_ref[0, 0, 2]
    pass_count = meta_ref[0, 0, 3]
    done = meta_ref[0, 0, 4]
    action = act_ref[0, 0, 0]

    me = to_move
    opp = 3 - me
    valid = consts_ref[0:1, :] > 0
    oppm = (stones == opp) & valid
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (1, NP), 1)

    frozen = done > 0
    is_pass = (action >= NN) | frozen
    p = jnp.where(action >= NN, 0, action)
    at_p = iota_q == p

    # ---- phase A: apply the action (see env_step.py apply section) --------
    _, chain_libs_a, pl_a = _chain_stats(consts_ref, stones, cid)
    nbr = _nbr_tables(consts_ref, [
        (stones, 3), (pl_a, 0.0), (cid, -1), (cxp0, 0), (cxp1, 0)])

    cap_k = [(st_k == opp) & (pl_k == 1.0) for st_k, pl_k, *_ in nbr]

    def scalar_at_p(vec):
        return jnp.sum(jnp.where(at_p, vec, 0))

    captured = jnp.zeros((1, NP), bool)
    member = jnp.zeros((1, NP), bool)
    new_id = p
    own_sc, cap_sc = [], []
    for k in range(4):
        st_k, _, cid_k, *_ = nbr[k]
        cap_id = scalar_at_p(jnp.where(cap_k[k], cid_k, -7))
        cap_sc.append(cap_id)
        captured |= (cid == cap_id) & (cap_id >= 0) & oppm
        is_own = st_k == me
        own_id = scalar_at_p(jnp.where(is_own, cid_k, -7))
        own_flag = scalar_at_p(is_own.astype(jnp.int32))
        own_sc.append((own_id, own_flag))
        member |= (cid == own_id) & (own_id >= 0) & (stones == me)
        new_id = jnp.where((own_flag > 0) & (own_id >= 0),
                           jnp.minimum(new_id, own_id), new_id)

    placing = ~is_pass
    cap_eff = captured & placing
    mem_eff = member & placing
    atp_eff = at_p & placing

    stones2 = jnp.where(atp_eff, me, jnp.where(cap_eff, 0, stones))
    cid2 = jnp.where(mem_eff | atp_eff, new_id,
                     jnp.where(cap_eff, iota_q, cid))

    # captured-chain zobrist aggregate at p (deduplicated directions)
    zme0 = jnp.where(me == 1, zob_ref[0:1, :], zob_ref[2:3, :])
    zme1 = jnp.where(me == 1, zob_ref[1:2, :], zob_ref[3:4, :])
    capx0 = jnp.int32(0)
    capx1 = jnp.int32(0)
    for k in range(4):
        dup = jnp.bool_(False)
        for j in range(k):
            dup = dup | ((cap_sc[j] == cap_sc[k]) & (cap_sc[j] >= 0))
        keep = (cap_sc[k] >= 0) \
            & scalar_at_p(cap_k[k].astype(jnp.int32)).astype(bool) & ~dup
        capx0 = capx0 ^ jnp.where(keep, scalar_at_p(nbr[k][3]), 0)
        capx1 = capx1 ^ jnp.where(keep, scalar_at_p(nbr[k][4]), 0)

    zp0 = scalar_at_p(zme0)
    zp1 = scalar_at_p(zme1)
    h0_2 = jnp.where(placing, h0 ^ zp0 ^ capx0, h0)
    h1_2 = jnp.where(placing, h1 ^ zp1 ^ capx1, h1)

    # merged chain aggregate = z[me][p] ^ XOR of distinct own neighbor chains
    nx0, nx1 = zp0, zp1
    for k in range(4):
        dup = jnp.bool_(False)
        for j in range(k):
            dup = dup | ((own_sc[j][0] == own_sc[k][0]) & (own_sc[j][0] >= 0))
        kf = (own_sc[k][0] >= 0) & (own_sc[k][1] > 0) & ~dup
        nx0 = nx0 ^ jnp.where(kf, scalar_at_p(nbr[k][3]), 0)
        nx1 = nx1 ^ jnp.where(kf, scalar_at_p(nbr[k][4]), 0)
    cxp0_2 = jnp.where(mem_eff | atp_eff, nx0, jnp.where(cap_eff, 0, cxp0))
    cxp1_2 = jnp.where(mem_eff | atp_eff, nx1, jnp.where(cap_eff, 0, cxp1))

    hist0 = hist_ref[0, 0:1, :RING]
    hist1 = hist_ref[0, 1:2, :RING]
    slot = jnp.remainder(placed, RING)
    slot_mask = (jax.lax.broadcasted_iota(jnp.int32, (1, RING), 1) == slot) \
        & placing
    hist0_2 = jnp.where(slot_mask, h0_2, hist0)
    hist1_2 = jnp.where(slot_mask, h1_2, hist1)

    placed2 = placed + placing.astype(jnp.int32)
    move_count2 = jnp.where(frozen, move_count, move_count + 1)
    pass_count2 = jnp.where(frozen, pass_count,
                            jnp.where(is_pass, pass_count + 1, 0))
    done2 = jnp.where(frozen, 1,
                      jnp.where(is_pass & (pass_count + 1 >= 2), 1, 0))
    to_move2 = jnp.where(frozen, me, opp)
    last0 = meta_ref[0, 0, 5]
    last1 = meta_ref[0, 0, 6]
    last0_2 = jnp.where(frozen | is_pass, last0, p)
    last1_2 = jnp.where(frozen | is_pass, last1, last0)

    stones_o[0, 0:1, :] = stones2
    cid_o[0, 0:1, :] = cid2
    cxp_o[0, 0:1, :] = cxp0_2
    cxp_o[0, 1:2, :] = cxp1_2
    hist_o[0, 0:1, :RING] = hist0_2
    hist_o[0, 1:2, :RING] = hist1_2
    hist_o[0, 0:1, RING:] = hist_ref[0, 0:1, RING:]
    hist_o[0, 1:2, RING:] = hist_ref[0, 1:2, RING:]
    meta_o[0, 0, 0] = to_move2
    meta_o[0, 0, 1] = placed2
    meta_o[0, 0, 2] = move_count2
    meta_o[0, 0, 3] = pass_count2
    meta_o[0, 0, 4] = done2
    meta_o[0, 0, 5] = last0_2
    meta_o[0, 0, 6] = last1_2
    meta_o[0, 0, 7] = meta_ref[0, 0, 7]
    hash_o[0, 0, 0] = h0_2
    hash_o[0, 0, 1] = h1_2
    for w in range(2, 8):
        hash_o[0, 0, w] = hash_ref[0, 0, w]

    # ---- phase B: V1 features + candidate mask of the new position --------
    t2 = to_move2
    o2 = 3 - t2
    empty2 = (stones2 == 0) & valid
    empty2_f = empty2.astype(jnp.float32)
    m2, chain_libs2, pl_q2 = _chain_stats(consts_ref, stones2, cid2)

    ident = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (NP, NP), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (NP, NP), 0), 1.0, 0.0)
    adjmat = jnp.zeros((NP, NP), jnp.float32)
    for s in _SHIFTS:
        mk = consts_ref[_MASK_ROW[s]:_MASK_ROW[s] + 1, :] \
            .astype(jnp.float32).reshape(NP, 1)
        adjmat = jnp.maximum(adjmat, _roll(ident, s, 0) * mk)

    nbr2 = _nbr_tables(consts_ref, [
        (stones2, 3), (pl_q2, 0.0), (cid2, -1),
        (cxp0_2, 0), (cxp1_2, 0)])

    # pseudo-legality for both colors (board_fast.rs:216-243)
    pseudo = {}
    for color in (1, 2):
        has_empty = jnp.zeros((1, NP), bool)
        own_ok = jnp.zeros((1, NP), bool)
        cap_ok = jnp.zeros((1, NP), bool)
        for st_k, pl_k, *_ in nbr2:
            has_empty |= st_k == 0
            own_ok |= (st_k == color) & (pl_k >= 2.0)
            cap_ok |= (st_k == (3 - color)) & (pl_k == 1.0)
        pseudo[color] = empty2 & (has_empty | own_ok | cap_ok)
    # Mosaic can't legalize select on i1 vectors; select in i32 instead
    p1i = pseudo[1].astype(jnp.int32)
    p2i = pseudo[2].astype(jnp.int32)
    pseudo_t2 = jnp.where(t2 == 1, p1i, p2i) > 0
    pseudo_o2 = jnp.where(t2 == 1, p2i, p1i) > 0

    # liberties-after-move for both colors (counting identity, bf16 MXU)
    libs1 = (chain_libs2 == 1.0).astype(jnp.float32)     # [1, c]
    libs_if = {}
    for color in (1, 2):
        own_col = ((stones2 == color) & valid).astype(jnp.float32) \
            .reshape(NP, 1)
        opp_col = ((stones2 == (3 - color)) & valid).astype(jnp.float32) \
            .reshape(NP, 1)
        member_own = m2 * own_col
        own_adj = jnp.zeros((NP, NP), jnp.float32)
        for s in _SHIFTS:
            mk = consts_ref[_MASK_ROW[s]:_MASK_ROW[s] + 1, :] \
                .astype(jnp.float32).reshape(NP, 1)
            own_adj = jnp.maximum(own_adj, _roll(member_own, s, 0) * mk)
        own_adj16 = own_adj.astype(jnp.bfloat16)
        match = jnp.dot(own_adj16, own_adj16.T,
                        preferred_element_type=jnp.float32)

        member_cap = m2 * opp_col * libs1
        cap_adj = jnp.zeros((NP, NP), jnp.float32)
        for s in _SHIFTS:
            mk = consts_ref[_MASK_ROW[s]:_MASK_ROW[s] + 1, :] \
                .astype(jnp.float32).reshape(NP, 1)
            cap_adj = jnp.maximum(cap_adj, _roll(member_cap, s, 0) * mk)
        cap_member = jnp.dot(cap_adj.astype(jnp.bfloat16),
                             member_cap.T.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)

        open_after = jnp.maximum(empty2_f, jnp.minimum(cap_member, 1.0))
        reach = jnp.maximum(adjmat, jnp.minimum(match, 1.0))
        nodiag = 1.0 - ident
        libs_if[color] = jnp.sum(open_after * reach * nodiag, axis=1) \
            .reshape(1, NP)
    libs_if_t2 = jnp.where(t2 == 1, libs_if[1], libs_if[2])
    libs_if_o2 = jnp.where(t2 == 1, libs_if[2], libs_if[1])
    libs_if_t2 = jnp.where(pseudo_t2, libs_if_t2, 0.0)
    libs_if_o2 = jnp.where(pseudo_o2, libs_if_o2, 0.0)

    # super-ko plane: candidate hashes for t2 against the updated ring
    zt0 = jnp.where(t2 == 1, zob_ref[0:1, :], zob_ref[2:3, :])
    zt1 = jnp.where(t2 == 1, zob_ref[1:2, :], zob_ref[3:4, :])
    cap2_k = [(st_k == o2) & (pl_k == 1.0) for st_k, pl_k, *_ in nbr2]
    keep2 = []
    for k in range(4):
        dup = jnp.zeros((1, NP), bool)
        for j in range(k):
            dup |= cap2_k[j] & (nbr2[j][2] == nbr2[k][2])
        keep2.append(cap2_k[k] & ~dup)
    scapx0 = jnp.zeros((1, NP), jnp.int32)
    scapx1 = jnp.zeros((1, NP), jnp.int32)
    for k in range(4):
        scapx0 ^= jnp.where(keep2[k], nbr2[k][3], 0)
        scapx1 ^= jnp.where(keep2[k], nbr2[k][4], 0)
    hc0 = h0_2 ^ zt0 ^ scapx0
    hc1 = h1_2 ^ zt1 ^ scapx1
    ring_valid = (jax.lax.broadcasted_iota(jnp.int32, (1, RING), 1)
                  < jnp.minimum(placed2, RING))
    ko_match = ((hc0.reshape(NP, 1) == hist0_2.reshape(1, RING))
                & (hc1.reshape(NP, 1) == hist1_2.reshape(1, RING))
                & ring_valid.reshape(1, RING))
    in_ring = jnp.max(ko_match.astype(jnp.int32), axis=1).reshape(1, NP) > 0
    ko = in_ring & pseudo_t2
    any_ko = jnp.max(ko.astype(jnp.int32)) > 0

    cand_o[0, 0:1, :] = \
        (pseudo_t2 & ~in_ring & (done2 == 0)).astype(jnp.int32)

    # ---- plane assembly (features.rs:104-148 order) ----------------------
    komi = komi_ref[0, 0, 0]
    komi_c = jnp.clip(0.5 + 0.5 * komi / 7.5, 0.0, 1.0)
    ones = valid.astype(jnp.float32)
    zeros = jnp.zeros((1, NP), jnp.float32)
    f32 = lambda x: jnp.where(valid, x.astype(jnp.float32), 0.0)

    feat_o[0, 0:1, :] = ones * jnp.where(t2 == 1, komi_c, 0.0)
    feat_o[0, 1:2, :] = ones * jnp.where(t2 == 1, 0.0, komi_c)
    feat_o[0, 2:3, :] = ones * any_ko.astype(jnp.float32)
    feat_o[0, 3:4, :] = f32((iota_q == last0_2) & (last0_2 < NN))
    feat_o[0, 4:5, :] = f32((iota_q == last1_2) & (last1_2 < NN))

    own_libs = jnp.where((stones2 == t2) & valid, pl_q2, 0.0)
    opp_libs = jnp.where((stones2 == o2) & valid, pl_q2, 0.0)
    for k in range(1, 7):
        feat_o[0, 4 + k:5 + k, :] = f32(own_libs >= k)         # 5-10
        feat_o[0, 10 + k:11 + k, :] = f32(libs_if_t2 >= k)     # 11-16
        feat_o[0, 16 + k:17 + k, :] = f32(opp_libs >= k)       # 17-22
        feat_o[0, 22 + k:23 + k, :] = f32(libs_if_o2 >= k)     # 23-28
    feat_o[0, 29:30, :] = f32(ko)
    feat_o[0, 30:31, :] = zeros
    feat_o[0, 31:32, :] = zeros


@functools.partial(jax.jit, static_argnames=("interpret",))
def leaf_step(stones, cid, cxp, hist, meta, hashw, action, komi,
              interpret: bool | None = None):
    """Apply ``action`` per board and featurize the result, fused.

    Inputs are kernel-layout state arrays (`env_step.pack_states` shapes):
    stones/cid i32[B,1,NP], cxp i32[B,2,NP], hist i32[B,2,128],
    meta/hashw i32[B,1,8]; ``action`` i32[B] (361 = pass), ``komi`` f32[B].

    Returns ``(leaf_packed, feats, cand)`` with ``leaf_packed`` the same six
    arrays for the new position, ``feats`` f32[B, 32, NP] plane-major V1
    features, and ``cand`` bool[B, 361] the StandardSearch point mask.
    """
    if interpret is None:  # run anywhere: interpret on CPU (hermetic tests)
        interpret = jax.default_backend() == "cpu"
    b = stones.shape[0]
    consts = jnp.asarray(np.stack([
        _VALID, _MASK[1], _MASK[-1], _MASK[N], _MASK[-N],
        np.zeros(NP, bool), np.zeros(NP, bool), np.zeros(NP, bool),
    ]).astype(np.int32))
    zob = jnp.asarray(np.stack([
        _ZB[:, 0], _ZB[:, 1], _ZW[:, 0], _ZW[:, 1]]).view(np.int32))

    actw = jnp.zeros((b, 1, 8), jnp.int32).at[:, 0, 0].set(
        action.astype(jnp.int32))
    komiw = jnp.zeros((b, 1, 8), jnp.float32).at[:, 0, 0].set(komi)

    row = lambda shape, space: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1), memory_space=space)
    shared = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    specs_in = [
        shared((8, NP)), shared((4, NP)),
        row((1, 1, NP), pltpu.VMEM), row((1, 1, NP), pltpu.VMEM),
        row((1, 2, NP), pltpu.VMEM), row((1, 2, 128), pltpu.VMEM),
        row((1, 1, 8), pltpu.SMEM), row((1, 1, 8), pltpu.SMEM),
        row((1, 1, 8), pltpu.SMEM), row((1, 1, 8), pltpu.SMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((b, 1, NP), jnp.int32),
        jax.ShapeDtypeStruct((b, 1, NP), jnp.int32),
        jax.ShapeDtypeStruct((b, 2, NP), jnp.int32),
        jax.ShapeDtypeStruct((b, 2, 128), jnp.int32),
        jax.ShapeDtypeStruct((b, 1, 8), jnp.int32),
        jax.ShapeDtypeStruct((b, 1, 8), jnp.int32),
        jax.ShapeDtypeStruct((b, 32, NP), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, NP), jnp.int32),
    ]
    specs_out = [
        row((1, 1, NP), pltpu.VMEM), row((1, 1, NP), pltpu.VMEM),
        row((1, 2, NP), pltpu.VMEM), row((1, 2, 128), pltpu.VMEM),
        row((1, 1, 8), pltpu.SMEM), row((1, 1, 8), pltpu.SMEM),
        row((1, 32, NP), pltpu.VMEM), row((1, 1, NP), pltpu.VMEM),
    ]

    outs = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=specs_in,
        out_specs=specs_out,
        out_shape=out_shapes,
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3, 6: 4, 7: 5},
        interpret=interpret,
    )(consts, zob, stones, cid, cxp, hist, meta, hashw, actw, komiw)

    *leaf_packed, feats, cand = outs
    return tuple(leaf_packed), feats, cand[:, 0, :NN] > 0
