"""Fused Pallas TPU kernel for one MCTS leaf expansion.

The per-simulation hot path outside the network is: play the selected action
on the parent board, then extract the 32 V1 feature planes and the legality
mask of the resulting leaf (`search.py` select -> step -> features -> masks).
The XLA formulation moves [B,361,361]-class intermediates through HBM three
separate times (env step, liberties-after kernel, super-ko masks); this
kernel runs the whole thing in VMEM, G boards per grid step:

- phase A applies the given action (capture/merge/hash/ring update), the
  same board mechanics as `ops/env_step.py` but with the move supplied by
  tree select instead of sampled;
- phase B computes every V1 plane (`features.rs:104-148`) plus the
  StandardSearch candidate mask for the *new* position: chain liberties via
  one membership matvec, liberties-after-move for both colors via the
  counting identity of `ops/libs_after.py` (bf16 MXU matmuls, exact for 0/1
  operands with f32 accumulation), super-ko candidate hashes against the
  updated ring, pseudo-legality for both colors.

Performance structure: all ROW ops are vectorized across G=8 boards in the
sublane dimension (a [1, NP] row uses 1/8 of the VPU; [G, NP] uses all of
it), while the per-board [NP, NP] membership/adjacency matrices and their
MXU matmuls run in an unrolled loop.  The neighbour-adjacency rolls are
computed ONCE per board and shared between colors: rolling ``m * colmask``
equals ``roll(m) * colmask`` because the mask is per-column (per-chain).

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
    """Roll each [G, NP] row set in ``rows`` into the 4 directions.

    Returns a list of 4 tuples (one per direction) of the rolled rows, with
    off-board lanes replaced by the per-row fill value, plus the mask.
    """
    out = []
    for s in _SHIFTS:
        mk = consts_ref[_MASK_ROW[s]:_MASK_ROW[s] + 1, :] > 0
        out.append(tuple(jnp.where(mk, _roll(row, s, 1), fill)
                         for row, fill in rows) + (mk,))
    return out


def _chain_stats_g(consts_ref, stones, cid, g_range):
    """Per-chain liberty counts and per-point liberty counts, [G, NP] each.

    Row ops are G-vectorized; the [NP, NP] membership/adjacency work runs
    per board (unrolled).  Also returns the per-board membership and
    adjacency matrices for reuse by the caller (phase B only).
    """
    valid = consts_ref[0:1, :] > 0
    empty = ((stones == 0) & valid).astype(jnp.float32)       # [G, NP]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (NP, NP), 1)

    dir_masks = [consts_ref[_MASK_ROW[s]:_MASK_ROW[s] + 1, :]
                 .astype(jnp.float32).reshape(NP, 1) for s in _SHIFTS]

    ms, adjs, chain_rows, pl_rows = [], [], [], []
    for g in g_range:
        stones_g = stones[g:g + 1, :]
        stonep = ((stones_g > 0) & valid).astype(jnp.int32).reshape(NP, 1)
        m = jnp.where((iota_c == cid[g:g + 1, :].reshape(NP, 1))
                      & (stonep > 0), 1.0, 0.0)
        adj = jnp.zeros((NP, NP), jnp.float32)                # [e, c]
        for s, mk in zip(_SHIFTS, dir_masks):
            adj = jnp.maximum(adj, _roll(m, s, 0) * mk)
        chain_libs = jnp.sum(adj * empty[g:g + 1, :].reshape(NP, 1),
                             axis=0).reshape(1, NP)
        pl_q = jnp.dot(m, chain_libs.reshape(NP, 1),
                       preferred_element_type=jnp.float32).reshape(1, NP)
        ms.append(m)
        adjs.append(adj)
        chain_rows.append(chain_libs)
        pl_rows.append(pl_q)
    return (ms, adjs, jnp.concatenate(chain_rows, axis=0),
            jnp.concatenate(pl_rows, axis=0))


def _make_kernel(g: int):
    def _kernel(consts_ref, zob_ref, adjmat_ref, stones_ref, cid_ref,
                cxp_ref, hist_ref, meta_ref, hash_ref, act_ref, komi_ref,
                stones_o, cid_o, cxp_o, hist_o, meta_o, hash_o, feat_o,
                cand_o):
        g_range = range(g)
        stones = stones_ref[:, 0, :]                 # i32 [G, NP]
        cid = cid_ref[:, 0, :]
        cxp0 = cxp_ref[:, 0, :]
        cxp1 = cxp_ref[:, 1, :]
        h0 = hash_ref[:, 0, 0:1]                     # [G, 1]
        h1 = hash_ref[:, 0, 1:2]
        to_move = meta_ref[:, 0, 0:1]
        placed = meta_ref[:, 0, 1:2]
        move_count = meta_ref[:, 0, 2:3]
        pass_count = meta_ref[:, 0, 3:4]
        done = meta_ref[:, 0, 4:5]
        action = act_ref[:, 0, 0:1]

        me = to_move                                  # [G, 1]
        opp = 3 - me
        valid = consts_ref[0:1, :] > 0
        oppm = (stones == opp) & valid
        iota_q = jax.lax.broadcasted_iota(jnp.int32, (g, NP), 1)

        frozen = done > 0
        is_pass = (action >= NN) | frozen
        p = jnp.where(action >= NN, 0, action)        # [G, 1]
        at_p = iota_q == p

        # ---- phase A: apply the action (env_step.py apply section) -------
        _, _, chain_libs_a, pl_a = _chain_stats_g(
            consts_ref, stones, cid, g_range)
        nbr = _nbr_tables(consts_ref, [
            (stones, 3), (pl_a, 0.0), (cid, -1), (cxp0, 0), (cxp1, 0)])

        cap_k = [(st_k == opp) & (pl_k == 1.0) for st_k, pl_k, *_ in nbr]

        def scalar_at_p(vec):
            return jnp.sum(jnp.where(at_p, vec, 0), axis=1, keepdims=True)

        captured = jnp.zeros((g, NP), bool)
        member = jnp.zeros((g, NP), bool)
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

        placing = ~is_pass                            # [G, 1]
        cap_eff = captured & placing
        mem_eff = member & placing
        atp_eff = at_p & placing

        stones2 = jnp.where(atp_eff, me, jnp.where(cap_eff, 0, stones))
        cid2 = jnp.where(mem_eff | atp_eff, new_id,
                         jnp.where(cap_eff, iota_q, cid))

        # captured-chain zobrist aggregate at p (deduplicated directions)
        zme0 = jnp.where(me == 1, zob_ref[0:1, :], zob_ref[2:3, :])
        zme1 = jnp.where(me == 1, zob_ref[1:2, :], zob_ref[3:4, :])
        capx0 = jnp.zeros((g, 1), jnp.int32)
        capx1 = jnp.zeros((g, 1), jnp.int32)
        for k in range(4):
            dup = jnp.zeros((g, 1), bool)
            for j in range(k):
                dup = dup | ((cap_sc[j] == cap_sc[k]) & (cap_sc[j] >= 0))
            keep = (cap_sc[k] >= 0) \
                & (scalar_at_p(cap_k[k].astype(jnp.int32)) > 0) & ~dup
            capx0 = capx0 ^ jnp.where(keep, scalar_at_p(nbr[k][3]), 0)
            capx1 = capx1 ^ jnp.where(keep, scalar_at_p(nbr[k][4]), 0)

        zp0 = scalar_at_p(zme0)
        zp1 = scalar_at_p(zme1)
        h0_2 = jnp.where(placing, h0 ^ zp0 ^ capx0, h0)
        h1_2 = jnp.where(placing, h1 ^ zp1 ^ capx1, h1)

        # merged-chain aggregate = z[me][p] ^ XOR of distinct own neighbors
        nx0, nx1 = zp0, zp1
        for k in range(4):
            dup = jnp.zeros((g, 1), bool)
            for j in range(k):
                dup = dup | ((own_sc[j][0] == own_sc[k][0])
                             & (own_sc[j][0] >= 0))
            kf = (own_sc[k][0] >= 0) & (own_sc[k][1] > 0) & ~dup
            nx0 = nx0 ^ jnp.where(kf, scalar_at_p(nbr[k][3]), 0)
            nx1 = nx1 ^ jnp.where(kf, scalar_at_p(nbr[k][4]), 0)
        cxp0_2 = jnp.where(mem_eff | atp_eff, nx0,
                           jnp.where(cap_eff, 0, cxp0))
        cxp1_2 = jnp.where(mem_eff | atp_eff, nx1,
                           jnp.where(cap_eff, 0, cxp1))

        hist0 = hist_ref[:, 0, :RING]
        hist1 = hist_ref[:, 1, :RING]
        slot = jnp.remainder(placed, RING)            # [G, 1]
        slot_mask = (jax.lax.broadcasted_iota(jnp.int32, (g, RING), 1)
                     == slot) & placing
        hist0_2 = jnp.where(slot_mask, h0_2, hist0)
        hist1_2 = jnp.where(slot_mask, h1_2, hist1)

        placed2 = placed + placing.astype(jnp.int32)
        move_count2 = jnp.where(frozen, move_count, move_count + 1)
        pass_count2 = jnp.where(frozen, pass_count,
                                jnp.where(is_pass, pass_count + 1, 0))
        done2 = jnp.where(frozen, 1,
                          jnp.where(is_pass & (pass_count + 1 >= 2), 1, 0))
        to_move2 = jnp.where(frozen, me, opp)
        last0 = meta_ref[:, 0, 5:6]
        last1 = meta_ref[:, 0, 6:7]
        last0_2 = jnp.where(frozen | is_pass, last0, p)
        last1_2 = jnp.where(frozen | is_pass, last1, last0)

        stones_o[:, 0, :] = stones2
        cid_o[:, 0, :] = cid2
        cxp_o[:, 0, :] = cxp0_2
        cxp_o[:, 1, :] = cxp1_2
        hist_o[:, 0, :RING] = hist0_2
        hist_o[:, 1, :RING] = hist1_2
        hist_o[:, 0, RING:] = hist_ref[:, 0, RING:]
        hist_o[:, 1, RING:] = hist_ref[:, 1, RING:]
        meta_cols = [to_move2, placed2, move_count2, pass_count2, done2,
                     last0_2, last1_2, meta_ref[:, 0, 7:8]]
        meta_o[:, 0, :] = jnp.concatenate(meta_cols, axis=1)
        hash_o[:, 0, :] = jnp.concatenate(
            [h0_2, h1_2, hash_ref[:, 0, 2:]], axis=1)

        # ---- phase B: V1 features + candidate mask of the new position ---
        t2 = to_move2                                  # [G, 1]
        o2 = 3 - t2
        empty2 = (stones2 == 0) & valid
        m2s, adj2s, chain_libs2, pl_q2 = _chain_stats_g(
            consts_ref, stones2, cid2, g_range)

        nbr2 = _nbr_tables(consts_ref, [
            (stones2, 3), (pl_q2, 0.0), (cid2, -1),
            (cxp0_2, 0), (cxp1_2, 0)])

        # pseudo-legality for both colors (board_fast.rs:216-243)
        pseudo = {}
        for color in (1, 2):
            has_empty = jnp.zeros((g, NP), bool)
            own_ok = jnp.zeros((g, NP), bool)
            cap_ok = jnp.zeros((g, NP), bool)
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

        # liberties-after-move for both colors (counting identity).  The
        # adjacency rolls are per board and shared: roll(m * colmask) ==
        # roll(m) * colmask because the mask is per-chain (per-column), and
        # a chain's color is the color of its min-member point, so the
        # per-column color mask is just the stones row itself.
        libs1 = (chain_libs2 == 1.0).astype(jnp.float32)       # [G, NP]
        empty2_f = empty2.astype(jnp.float32)
        nodiag = 1.0 - jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (NP, NP), 1)
            == jax.lax.broadcasted_iota(jnp.int32, (NP, NP), 0), 1.0, 0.0)
        libs_if = {1: [], 2: []}
        for gi in g_range:
            m2 = m2s[gi]
            adj_m = adj2s[gi]
            stones_g = stones2[gi:gi + 1, :]
            empty_g = empty2_f[gi:gi + 1, :]
            libs1_g = libs1[gi:gi + 1, :]
            adjmat = adjmat_ref[...]
            for color in (1, 2):
                own_col = ((stones_g == color)
                           .astype(jnp.float32)).reshape(1, NP)
                opp_col = ((stones_g == (3 - color))
                           .astype(jnp.float32)).reshape(1, NP)
                own_adj16 = (adj_m * own_col).astype(jnp.bfloat16)
                match = jnp.dot(own_adj16, own_adj16.T,
                                preferred_element_type=jnp.float32)
                capmask = opp_col * libs1_g                    # [1, NP]
                member_cap = m2 * capmask
                cap_adj = adj_m * capmask
                cap_member = jnp.dot(cap_adj.astype(jnp.bfloat16),
                                     member_cap.T.astype(jnp.bfloat16),
                                     preferred_element_type=jnp.float32)
                open_after = jnp.maximum(empty_g.reshape(1, NP),
                                         jnp.minimum(cap_member, 1.0))
                reach = jnp.maximum(adjmat, jnp.minimum(match, 1.0))
                libs_if[color].append(
                    jnp.sum(open_after * reach * nodiag, axis=1)
                    .reshape(1, NP))
        libs_if1 = jnp.concatenate(libs_if[1], axis=0)          # [G, NP]
        libs_if2 = jnp.concatenate(libs_if[2], axis=0)
        libs_if_t2 = jnp.where(t2 == 1, libs_if1, libs_if2)
        libs_if_o2 = jnp.where(t2 == 1, libs_if2, libs_if1)
        libs_if_t2 = jnp.where(pseudo_t2, libs_if_t2, 0.0)
        libs_if_o2 = jnp.where(pseudo_o2, libs_if_o2, 0.0)

        # super-ko plane: candidate hashes for t2 against the updated ring
        zt0 = jnp.where(t2 == 1, zob_ref[0:1, :], zob_ref[2:3, :])
        zt1 = jnp.where(t2 == 1, zob_ref[1:2, :], zob_ref[3:4, :])
        cap2_k = [(st_k == o2) & (pl_k == 1.0) for st_k, pl_k, *_ in nbr2]
        keep2 = []
        for k in range(4):
            dup = jnp.zeros((g, NP), bool)
            for j in range(k):
                dup |= cap2_k[j] & (nbr2[j][2] == nbr2[k][2])
            keep2.append(cap2_k[k] & ~dup)
        scapx0 = jnp.zeros((g, NP), jnp.int32)
        scapx1 = jnp.zeros((g, NP), jnp.int32)
        for k in range(4):
            scapx0 ^= jnp.where(keep2[k], nbr2[k][3], 0)
            scapx1 ^= jnp.where(keep2[k], nbr2[k][4], 0)
        hc0 = h0_2 ^ zt0 ^ scapx0                              # [G, NP]
        hc1 = h1_2 ^ zt1 ^ scapx1
        ring_iota = jax.lax.broadcasted_iota(jnp.int32, (g, RING), 1)
        ring_valid = ring_iota < jnp.minimum(placed2, RING)
        in_rows = []
        for gi in g_range:
            km = ((hc0[gi:gi + 1, :].reshape(NP, 1)
                   == hist0_2[gi:gi + 1, :].reshape(1, RING))
                  & (hc1[gi:gi + 1, :].reshape(NP, 1)
                     == hist1_2[gi:gi + 1, :].reshape(1, RING))
                  & ring_valid[gi:gi + 1, :].reshape(1, RING))
            in_rows.append(jnp.max(km.astype(jnp.int32), axis=1)
                           .reshape(1, NP))
        in_ring = jnp.concatenate(in_rows, axis=0) > 0          # [G, NP]
        ko = in_ring & pseudo_t2
        any_ko = jnp.max(ko.astype(jnp.int32), axis=1,
                         keepdims=True) > 0                     # [G, 1]

        cand_o[:, 0, :] = \
            (pseudo_t2 & ~in_ring & (done2 == 0)).astype(jnp.int32)

        # ---- plane assembly (features.rs:104-148 order) ------------------
        komi = komi_ref[:, 0, 0:1]                              # [G, 1]
        komi_c = jnp.clip(0.5 + 0.5 * komi / 7.5, 0.0, 1.0)
        ones = jnp.broadcast_to(valid.astype(jnp.float32), (g, NP))
        zeros = jnp.zeros((g, NP), jnp.float32)
        f32 = lambda x: jnp.where(valid, x.astype(jnp.float32), 0.0)

        feat_o[:, 0, :] = ones * jnp.where(t2 == 1, komi_c, 0.0)
        feat_o[:, 1, :] = ones * jnp.where(t2 == 1, 0.0, komi_c)
        feat_o[:, 2, :] = ones * any_ko.astype(jnp.float32)
        feat_o[:, 3, :] = f32((iota_q == last0_2) & (last0_2 < NN))
        feat_o[:, 4, :] = f32((iota_q == last1_2) & (last1_2 < NN))

        own_libs = jnp.where((stones2 == t2) & valid, pl_q2, 0.0)
        opp_libs = jnp.where((stones2 == o2) & valid, pl_q2, 0.0)
        for k in range(1, 7):
            feat_o[:, 4 + k, :] = f32(own_libs >= k)            # 5-10
            feat_o[:, 10 + k, :] = f32(libs_if_t2 >= k)         # 11-16
            feat_o[:, 16 + k, :] = f32(opp_libs >= k)           # 17-22
            feat_o[:, 22 + k, :] = f32(libs_if_o2 >= k)         # 23-28
        feat_o[:, 29, :] = f32(ko)
        feat_o[:, 30, :] = zeros
        feat_o[:, 31, :] = zeros

    return _kernel


# point-adjacency matrix is board-independent: precompute on host with the
# same roll semantics the in-kernel construction used (np.roll == pltpu.roll)
_ADJMAT = np.zeros((NP, NP), np.float32)
for _s in _SHIFTS:
    _rolled = np.roll(np.eye(NP, dtype=np.float32), _s, axis=0)
    _ADJMAT = np.maximum(_ADJMAT, _rolled * _MASK[_s].astype(np.float32)
                         .reshape(NP, 1))
del _s, _rolled


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
    g = 8 if b % 8 == 0 else (4 if b % 4 == 0 else
                              (2 if b % 2 == 0 else 1))
    consts = jnp.asarray(np.stack([
        _VALID, _MASK[1], _MASK[-1], _MASK[N], _MASK[-N],
        np.zeros(NP, bool), np.zeros(NP, bool), np.zeros(NP, bool),
    ]).astype(np.int32))
    zob = jnp.asarray(np.stack([
        _ZB[:, 0], _ZB[:, 1], _ZW[:, 0], _ZW[:, 1]]).view(np.int32))
    adjmat = jnp.asarray(_ADJMAT)

    actw = jnp.zeros((b, 1, 8), jnp.int32).at[:, 0, 0].set(
        action.astype(jnp.int32))
    komiw = jnp.zeros((b, 1, 8), jnp.float32).at[:, 0, 0].set(komi)

    row = lambda shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    shared = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    specs_in = [
        shared((8, NP)), shared((4, NP)), shared((NP, NP)),
        row((g, 1, NP)), row((g, 1, NP)),
        row((g, 2, NP)), row((g, 2, 128)),
        row((g, 1, 8)), row((g, 1, 8)),
        row((g, 1, 8)), row((g, 1, 8)),
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
        row((g, 1, NP)), row((g, 1, NP)),
        row((g, 2, NP)), row((g, 2, 128)),
        row((g, 1, 8)), row((g, 1, 8)),
        row((g, 32, NP)), row((g, 1, NP)),
    ]

    outs = pl.pallas_call(
        _make_kernel(g),
        grid=(b // g,),
        in_specs=specs_in,
        out_specs=specs_out,
        out_shape=out_shapes,
        input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3, 7: 4, 8: 5},
        interpret=interpret,
    )(consts, zob, adjmat, stones, cid, cxp, hist, meta, hashw, actw, komiw)

    *leaf_packed, feats, cand = outs
    return tuple(leaf_packed), feats, cand[:, 0, :NN] > 0
