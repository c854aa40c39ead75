"""Pallas TPU kernel for the EXACT branching ladder feature planes.

Computes is-ladder-capture / is-ladder-escape (feature planes 30/31,
`features.rs:101-148`) with the reference's full branch recursion
(`ladder.rs:53-178`) entirely in VMEM.  Same semantics as the XLA reader in
`go/ladder.py` (which `tests/test_ladder.py` pins to the recursive oracle
point-for-point) but a fundamentally different cost model:

- the XLA pooled-lane DFS recomputes O(board²) chain statistics per rung per
  candidate lane and its batched `while_loop` runs every lane in the batch
  to the longest chase anywhere (measured ~11 s per 1024-board batch on a
  v5e, `tools/profile_ladder.py`);
- this kernel keeps per-point chain-liberty counts (`plibs`) as an
  incrementally-maintained [lanes, NP] row — a stone placement only changes
  the liberty counts of the ≤4 chains adjacent to the point plus the merged
  chain, each recountable with four rolled-row ops — so a DFS rung is a
  handful of O(board) VPU row ops.  Captures invalidate third-party chains'
  counts; those (rare) rungs trigger a full [NP, NP] membership recount,
  branched on the scalar core per grid step, not paid in lockstep by the
  whole batch.  Each board's grid step runs only ITS candidates to only
  THEIR chase depths.

Layout: one board per grid step, up to 8 candidate chases vectorized across
the sublane dimension ([8, NP] rows, NP = 384); candidate groups and DFS
rungs are `while_loop`s on the scalar core.  Escape candidates run their ≤4
counter-attack chases (`ladder.rs:136-178`) as 4 of the 8 lanes, two escape
points per group.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..go.topology import NN
from .env_step import NP, _roll

N = 19
L = 8          # chase lanes per group
STACK_CAP = 8  # branch stack depth per lane (go/ladder.py STACK_CAP)
BUDGET = 320   # total rungs per lane across all explored lines; covers any
#                19x19-constructible chase with alternates (go/ladder.py
#                BUDGET rationale; the while_loop exits on status, so the
#                bound is free for normal boards)

# direction order MUST match go/topology.NBR (up, left, right, down): the
# chase takes the FIRST qualifying extension / branch in this order.
# "rolled from" semantics: nbr value at q for direction k is row[q - SHIFT].
_SHIFTS = (N, 1, -1, -N)

_IDX = np.arange(NP)
_VALID = _IDX < NN
_DIRM = {
    N: _VALID & (_IDX >= N),                      # has up neighbor
    1: _VALID & (_IDX % N > 0),                   # has left neighbor
    -1: _VALID & (_IDX % N < N - 1) & (_IDX + 1 < NN),
    -N: _VALID & (_IDX + N < NN),
}
_CONSTS = np.stack([_VALID] + [_DIRM[s] for s in _SHIFTS] +
                   [np.zeros(NP, bool)] * 3).astype(np.int32)


def _at(row, p):
    """Scalar-per-lane gather: row[l, p[l]] as [L, 1] (iota-select form)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    return jnp.sum(jnp.where(iota == p, row, 0), axis=1, keepdims=True)


def _rolled(consts_ref, row, fill):
    """[row shifted into each of the 4 NBR directions], off-board = fill."""
    out = []
    for k, s in enumerate(_SHIFTS):
        mk = consts_ref[k + 1:k + 2, :] > 0
        out.append(jnp.where(mk, _roll(row, s, 1), fill))
    return out


def _nbr_index(consts_ref, p):
    """The 4 neighbor indices of per-lane point p ([L,1] each; NN off-board).

    Uses the same roll semantics as the value gathers so ordering matches
    `topology.NBR` exactly.
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, (L, NP), 1)
    out = []
    for k, s in enumerate(_SHIFTS):
        mk = consts_ref[k + 1:k + 2, :] > 0
        rolled = jnp.where(mk, _roll(iota, s, 1), NN)
        out.append(_at(rolled, p))
    return out


def _chain_mask(cid, st, c):
    """[L, NP] membership of per-lane chain id c ([L,1]); empty excluded."""
    return ((cid == c) & (st > 0) & (c >= 0)).astype(jnp.int32)


def _dilate(consts_ref, mask):
    """OR of the 4 directional rolls of a [L, NP] 0/1 row."""
    out = jnp.zeros_like(mask)
    for k, s in enumerate(_SHIFTS):
        mk = consts_ref[k + 1:k + 2, :] > 0
        out = jnp.maximum(out, jnp.where(mk, _roll(mask, s, 1), 0))
    return out


def _count_chain_libs(consts_ref, st, cid, c):
    """Exact liberty count of per-lane chain c: |empty ∩ dilate(mask)|."""
    m = _chain_mask(cid, st, c)
    dil = _dilate(consts_ref, m)
    empty = ((st == 0) & (consts_ref[0:1, :] > 0)).astype(jnp.int32)
    return jnp.sum(dil * empty, axis=1, keepdims=True)


def _plibs_full(consts_ref, st, cid):
    """Exact per-point chain-liberty counts from scratch, [L, NP].

    One [NP, NP] membership/adjacency pass per lane (unrolled) — the
    capture-rung fallback and the per-board initialization.
    """
    valid = consts_ref[0:1, :] > 0
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (NP, NP), 1)
    rows = []
    for g in range(L):
        cid_col = cid[g:g + 1, :].reshape(NP, 1)
        stone_col = ((st[g:g + 1, :] > 0) & valid).astype(jnp.int32) \
            .reshape(NP, 1)
        m = jnp.where((iota_c == cid_col) & (stone_col > 0), 1.0, 0.0)
        adj = jnp.zeros((NP, NP), jnp.float32)
        for k, s in enumerate(_SHIFTS):
            mk = consts_ref[k + 1:k + 2, :].astype(jnp.float32) \
                .reshape(NP, 1)
            adj = jnp.maximum(adj, _roll(m, s, 0) * mk)
        empty_col = (((st[g:g + 1, :] == 0) & valid).astype(jnp.float32)
                     .reshape(NP, 1))
        chain_libs = jnp.sum(adj * empty_col, axis=0).reshape(1, NP)
        plb = jnp.dot(m, chain_libs.reshape(NP, 1),
                      preferred_element_type=jnp.float32).reshape(1, NP)
        rows.append(plb)
    return jnp.concatenate(rows, axis=0).astype(jnp.int32)


def _place(consts_ref, st, cid, plb, color, p, placing):
    """Stone placement with captures / merging / exact plibs maintenance.

    [L, NP] rows; ``color``/``p``/``placing`` are [L, 1].  Mirrors
    `engine.place_stones` (captures = adjacent opponent chains in atari,
    merge = min-id relabel) and keeps ``plb`` exact: the merged chain and
    every distinct adjacent opponent chain are recounted with rolled-row
    ops; if ANY lane captured, all lanes' plibs are recomputed from
    scratch (scalar-core branch).
    """
    valid = consts_ref[0:1, :] > 0
    iota = jax.lax.broadcasted_iota(jnp.int32, (L, NP), 1)
    opp = 3 - color
    at_p = (iota == p) & placing

    r_st = _rolled(consts_ref, st, 3)
    r_cid = _rolled(consts_ref, cid, -1)
    r_plb = _rolled(consts_ref, plb, 0)

    nst = [_at(r, p) for r in r_st]
    ncid = [_at(r, p) for r in r_cid]
    nplb = [_at(r, p) for r in r_plb]

    captured = jnp.zeros((L, NP), jnp.int32)
    cap_ids = []
    for k in range(4):
        cap_id = jnp.where((nst[k] == opp) & (nplb[k] == 1), ncid[k], -7)
        cap_ids.append(cap_id)
        captured = jnp.maximum(
            captured, ((cid == cap_id) & (cap_id >= 0)
                       & (st == opp)).astype(jnp.int32))
    captured = jnp.where(placing, captured, 0)

    new_id = jnp.where(placing, p, jnp.int32(NP))
    member = jnp.zeros((L, NP), jnp.int32)
    for k in range(4):
        own_id = jnp.where(nst[k] == color, ncid[k], jnp.int32(NP))
        new_id = jnp.minimum(new_id, own_id)
        member = jnp.maximum(
            member, ((cid == own_id) & (own_id < NP)
                     & (st == color)).astype(jnp.int32))
    member = jnp.where(placing, member, 0)

    st2 = jnp.where(at_p, color, jnp.where(captured > 0, 0, st))
    cid2 = jnp.where((member > 0) | at_p, new_id,
                     jnp.where(captured > 0, iota, cid))

    # exact plibs maintenance: recount the merged chain and each distinct
    # adjacent opponent chain (placement can only change chains adjacent
    # to p); captured points become empty (plibs 0).
    plb2 = jnp.where(captured > 0, 0, plb)
    recount = [jnp.where(placing, new_id, -1)]
    for k in range(4):
        is_opp = (nst[k] == opp) & placing & (cap_ids[k] < 0)
        recount.append(jnp.where(is_opp, ncid[k], -1))
    for c in recount:
        m = _chain_mask(cid2, st2, c)
        dil = _dilate(consts_ref, m)
        empty2 = ((st2 == 0) & valid).astype(jnp.int32)
        cnt = jnp.sum(dil * empty2, axis=1, keepdims=True)
        plb2 = jnp.where(m > 0, cnt, plb2)

    any_cap = jnp.max(captured) > 0

    def full(_):
        return _plibs_full(consts_ref, st2, cid2)

    def keep(_):
        return plb2

    plb2 = jax.lax.cond(any_cap, full, keep, 0)
    return st2, cid2, plb2


def _valid_at(consts_ref, st, plb, color, q):
    """`board_fast.rs:216-243` legality at per-lane point q for color.

    q == NN (off-board sentinel) returns False.
    """
    on = q < NN
    qc = jnp.minimum(q, NN - 1)
    opp = 3 - color
    r_st = _rolled(consts_ref, st, 3)
    r_plb = _rolled(consts_ref, plb, 0)
    ok = jnp.zeros_like(q)
    for k in range(4):
        s = _at(r_st[k], qc)
        pq = _at(r_plb[k], qc)
        ok = jnp.maximum(ok, ((s == 0) | ((s == color) & (pq >= 2))
                              | ((s == opp) & (pq == 1))).astype(jnp.int32))
    return (ok > 0) & (_at(st, qc) == 0) & on


def _chase_group(consts_ref, st0, cid0, plb0, color, attack0, active,
                 sst, scid, splb, satk):
    """Run the exact DFS chase for up to L lanes; returns captured [L,1].

    ``color`` is the attacker per lane; boards are per-lane copies.  Stack
    refs hold the not-taken branches (`ladder.rs:110-119` second recursion).
    Status: 0 = chasing, 1 = captured, 2 = failed/finished.
    """
    status0 = jnp.where(active, 0, 2).astype(jnp.int32)

    def cond(c):
        st, cid, plb, attack, status, sp, depth = c
        return jnp.logical_and(jnp.min(status) == 0, depth < BUDGET)

    def body(c):
        st, cid, plb, attack, status, sp, depth = c
        live = status == 0
        opp = 3 - color

        # --- rung: attacker plays, chased chain extends -------------------
        st1, cid1, plb1 = _place(consts_ref, st, cid, plb, color, attack,
                                 live)

        # first adjacent opponent chain in atari that cannot counter-capture
        # and whose lone liberty is playable (`ladder.rs:60-80`)
        r_st1 = _rolled(consts_ref, st1, 3)
        r_cid1 = _rolled(consts_ref, cid1, -1)
        atk_atari = ((st1 == color) & (plb1 == 1)).astype(jnp.int32)
        found = jnp.zeros_like(attack)
        ext = jnp.full_like(attack, NN)
        for k in range(4):
            ncid = _at(r_cid1[k], attack)
            nst = _at(r_st1[k], attack)
            m = _chain_mask(cid1, st1, jnp.where(nst == opp, ncid, -1))
            dil = _dilate(consts_ref, m)
            libs = jnp.sum(
                dil * ((st1 == 0) & (consts_ref[0:1, :] > 0))
                .astype(jnp.int32), axis=1, keepdims=True)
            iota = jax.lax.broadcasted_iota(jnp.int32, (L, NP), 1)
            lib_pt = jnp.min(jnp.where(
                (dil > 0) & (st1 == 0) & (consts_ref[0:1, :] > 0),
                iota, NN), axis=1, keepdims=True)
            counter = jnp.max(dil * atk_atari, axis=1, keepdims=True) > 0
            ok = ((nst == opp) & (libs == 1) & ~counter & (lib_pt < NN)
                  & _valid_at(consts_ref, st1, plb1, opp, lib_pt))
            take = ok & (found == 0)
            ext = jnp.where(take, lib_pt, ext)
            found = jnp.maximum(found, ok.astype(jnp.int32))

        ext_on = (found > 0) & live
        st2, cid2, plb2 = _place(consts_ref, st1, cid1, plb1, opp,
                                 jnp.minimum(ext, NN - 1), ext_on)
        ext_c = jnp.minimum(ext, NN - 1)
        def_cid = _at(cid2, ext_c)
        def_libs = _at(plb2, ext_c)

        # extension put an attacker chain in atari => escaped
        r_st2 = _rolled(consts_ref, st2, 3)
        r_plb2 = _rolled(consts_ref, plb2, 0)
        self_atari = jnp.zeros_like(attack)
        for k in range(4):
            s = _at(r_st2[k], ext_c)
            pq = _at(r_plb2[k], ext_c)
            self_atari = jnp.maximum(
                self_atari, ((s == color) & (pq == 1)).astype(jnp.int32))

        s_new = jnp.where(
            found == 0, 2,
            jnp.where(def_libs <= 1, 1,
                      jnp.where((def_libs >= 3) | (self_atari > 0), 2, 0)))
        s_new = jnp.where(live, s_new, status)

        # branch candidates: playable neighbors of ext, NBR order, then the
        # breathe-first / tight swap (exploration-order heuristic only)
        nbr_ext = _nbr_index(consts_ref, ext_c)
        c1 = jnp.full_like(attack, NN)
        c2 = jnp.full_like(attack, NN)
        for k in range(4):
            q = nbr_ext[k]
            v = (q < NN) & _valid_at(consts_ref, st2, plb2, color, q)
            take1 = v & (c1 == NN)
            take2 = v & ~take1 & (c2 == NN)
            c1 = jnp.where(take1, q, c1)
            c2 = jnp.where(take2, q, c2)

        def after_libs(attack_q, extend_q):
            ext_cc = jnp.minimum(extend_q, NN - 1)
            nbrs = _nbr_index(consts_ref, ext_cc)
            total = jnp.zeros_like(attack_q)
            for k in range(4):
                q = nbrs[k]
                s = _at(r_st2[k], ext_cc)
                total = total + ((s == 0) & (q != attack_q)
                                 & (q < NN)).astype(jnp.int32)
            return total

        both = (c1 < NN) & (c2 < NN)
        swap = both & (after_libs(c2, c1) > after_libs(c1, c2))
        c1s = jnp.where(swap, c2, c1)
        c2s = jnp.where(swap, c1, c2)

        cont = (s_new == 0) & (c1s < NN)
        fail = (s_new == 2) | ((s_new == 0) & (c1s >= NN))
        fail = fail & live

        # push the not-taken branch.  Mosaic has no scatter and cannot
        # prove alignment of dynamic-index stores, so both push and pop are
        # whole-stack masked read-modify-writes: a [L, STACK_CAP] slot mask
        # selects the one slot per lane being written/read.
        push = cont & (c2s < NN) & (sp < STACK_CAP)
        sc_iota = jax.lax.broadcasted_iota(jnp.int32, (L, STACK_CAP), 1)
        slot = (sc_iota == jnp.clip(sp, 0, STACK_CAP - 1)) & push  # [L, SC]
        # minor-dim insertion is only lowerable for 32-bit types: reshape the
        # i32 mask, compare after
        slot3 = slot.astype(jnp.int32)[:, :, None] > 0     # [L, SC, 1]
        slot3a = slot.astype(jnp.int32)[:, None, :] > 0    # [L, 1, SC]
        sst[...] = jnp.where(slot3, st2[:, None, :], sst[...])
        scid[...] = jnp.where(slot3, cid2[:, None, :], scid[...])
        splb[...] = jnp.where(slot3, plb2[:, None, :], splb[...])
        satk[...] = jnp.where(slot3a, c2s[:, :, None], satk[...])

        sp1 = sp + push.astype(jnp.int32)

        # pop a stacked branch on failure (masked one-hot reduce per lane)
        pop = fail & (sp1 > 0)
        spm = jnp.clip(sp1 - 1, 0, STACK_CAP - 1)
        pslot = (sc_iota == spm).astype(jnp.int32)          # [L, SC]
        pslot3 = pslot[:, :, None] > 0
        pslot3a = pslot[:, None, :] > 0
        st_l = jnp.sum(jnp.where(pslot3, sst[...], 0), axis=1)
        cid_l = jnp.sum(jnp.where(pslot3, scid[...], 0), axis=1)
        plb_l = jnp.sum(jnp.where(pslot3, splb[...], 0), axis=1)
        atk_l = jnp.sum(jnp.where(pslot3a, satk[...], 0), axis=2)

        st_n = jnp.where(cont, st2, st)
        cid_n = jnp.where(cont, cid2, cid)
        plb_n = jnp.where(cont, plb2, plb)
        atk_n = jnp.where(cont, c1s, attack)
        st_n = jnp.where(pop, st_l, st_n)
        cid_n = jnp.where(pop, cid_l, cid_n)
        plb_n = jnp.where(pop, plb_l, plb_n)
        atk_n = jnp.where(pop, atk_l, atk_n)

        sp_n = jnp.where(pop, sp1 - 1, sp1)
        status_n = jnp.where(
            live,
            jnp.where(s_new == 1, 1, jnp.where(cont | pop, 0, 2)),
            status)
        return (st_n, cid_n, plb_n, atk_n, status_n, sp_n, depth + 1)

    init = (st0, cid0, plb0, attack0, status0,
            jnp.zeros((L, 1), jnp.int32), jnp.int32(0))
    out = jax.lax.while_loop(cond, body, init)
    return (out[4] == 1).astype(jnp.int32)


def _kernel(consts_ref, stones_ref, cid_ref, meta_ref, cap_o, esc_o,
            sst, scid, splb, satk):
    valid = consts_ref[0:1, :] > 0
    st = stones_ref[0:1, 0, :]                    # [1, NP]
    cid = cid_ref[0:1, 0, :]
    color1 = meta_ref[0:1, 0, 0:1]                # [1, 1] to_move
    color = jnp.broadcast_to(color1, (L, 1))
    opp = 3 - color
    iota1 = jax.lax.broadcasted_iota(jnp.int32, (1, NP), 1)

    st8 = jnp.broadcast_to(st, (L, NP))
    cid8 = jnp.broadcast_to(cid, (L, NP))
    plb8 = _plibs_full(consts_ref, st8, cid8)
    plb = plb8[0:1, :]

    # pseudo-legality + candidate prefilter for to_move (ladder_planes)
    r_st = [r[0:1, :] for r in _rolled(consts_ref, st8, 3)]
    r_plb = [r[0:1, :] for r in _rolled(consts_ref, plb8, 0)]
    empty = (st == 0) & valid
    has_empty = jnp.zeros((1, NP), jnp.int32)
    own_ok = jnp.zeros((1, NP), jnp.int32)
    cap_ok = jnp.zeros((1, NP), jnp.int32)
    adj_opp2 = jnp.zeros((1, NP), jnp.int32)
    adj_own1 = jnp.zeros((1, NP), jnp.int32)
    for k in range(4):
        s, pq = r_st[k], r_plb[k]
        has_empty = jnp.maximum(has_empty, (s == 0).astype(jnp.int32))
        own_ok = jnp.maximum(
            own_ok, ((s == color1) & (pq >= 2)).astype(jnp.int32))
        cap_ok = jnp.maximum(
            cap_ok, ((s == (3 - color1)) & (pq == 1)).astype(jnp.int32))
        adj_opp2 = jnp.maximum(
            adj_opp2, ((s == (3 - color1)) & (pq == 2)).astype(jnp.int32))
        adj_own1 = jnp.maximum(
            adj_own1, ((s == color1) & (pq == 1)).astype(jnp.int32))
    pseudo = (empty & ((has_empty | own_ok | cap_ok) > 0)) \
        .astype(jnp.int32)
    cap_cand = pseudo * adj_opp2                  # [1, NP] 0/1
    esc_cand = pseudo * adj_own1

    # ---- capture candidates: groups of L lanes ---------------------------
    def cap_cond(c):
        cand, plane = c
        return jnp.max(cand) > 0

    def cap_body(c):
        cand, plane = c
        pts = []
        for _ in range(L):
            q = jnp.min(jnp.where(cand > 0, iota1, NN))
            pts.append(q)
            cand = jnp.where(iota1 == q, 0, cand)
        q8 = jnp.stack(pts).reshape(L, 1)
        active = q8 < NN
        captured = _chase_group(
            consts_ref, st8, cid8, plb8, color,
            jnp.minimum(q8, NN - 1), active, sst, scid, splb, satk)
        for lane in range(L):
            plane = jnp.maximum(
                plane, jnp.where((iota1 == q8[lane, 0])
                                 & (captured[lane, 0] > 0), 1, 0))
        return cand, plane

    _, cap_plane = jax.lax.while_loop(
        cap_cond, cap_body, (cap_cand, jnp.zeros((1, NP), jnp.int32)))

    # ---- escape candidates: 2 points x 4 counter-attack lanes ------------
    def esc_cond(c):
        cand, plane = c
        return jnp.max(cand) > 0

    def esc_body(c):
        cand, plane = c
        q0 = jnp.min(jnp.where(cand > 0, iota1, NN))
        cand = jnp.where(iota1 == q0, 0, cand)
        q1 = jnp.min(jnp.where(cand > 0, iota1, NN))
        cand = jnp.where(iota1 == q1, 0, cand)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
        q8 = jnp.where(lane_iota < 4, q0, q1)     # [L, 1]
        q_on = q8 < NN
        qc = jnp.minimum(q8, NN - 1)

        # place the escape move (plays color at q) on every lane
        est, ecid, eplb = _place(consts_ref, st8, cid8, plb8, color, qc,
                                 q_on)
        cnt = _at(eplb, qc)
        feasible = q_on & (cnt == 2)              # connected == candidacy

        # counter-attacks: the k-th neighbor of q for lane k (mod 4)
        nbrs = _nbr_index(consts_ref, qc)
        k_of_lane = jnp.remainder(lane_iota, 4)
        atk = jnp.full((L, 1), NN, jnp.int32)
        for k in range(4):
            atk = jnp.where(k_of_lane == k, nbrs[k], atk)
        playable = (atk < NN) & _valid_at(consts_ref, est, eplb,
                                          3 - color1, atk)
        active = feasible & playable
        captured = _chase_group(
            consts_ref, est, ecid, eplb, opp,
            jnp.minimum(atk, NN - 1), active, sst, scid, splb, satk)

        fail0 = jnp.max(jnp.where(lane_iota < 4, captured, 0)) > 0
        fail1 = jnp.max(jnp.where(lane_iota >= 4, captured, 0)) > 0
        ok0 = (jnp.max(jnp.where(lane_iota < 4,
                                 feasible.astype(jnp.int32), 0)) > 0) \
            & ~fail0
        ok1 = (jnp.max(jnp.where(lane_iota >= 4,
                                 feasible.astype(jnp.int32), 0)) > 0) \
            & ~fail1
        plane = jnp.maximum(plane, jnp.where((iota1 == q0) & ok0, 1, 0))
        plane = jnp.maximum(plane, jnp.where((iota1 == q1) & ok1, 1, 0))
        return cand, plane

    _, esc_plane = jax.lax.while_loop(
        esc_cond, esc_body, (esc_cand, jnp.zeros((1, NP), jnp.int32)))

    cap_o[0, 0, :] = cap_plane[0, :]
    esc_o[0, 0, :] = esc_plane[0, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def ladder_planes_kernel(stones, cid, to_move, interpret: bool | None = None):
    """(capture bool[B, 361], escape bool[B, 361]) for the player to move.

    ``stones``/``cid``: i32[B, 1, NP] kernel-layout rows (`env_step
    .pack_states` fields); ``to_move``: i32[B].  Exact branch-recursion
    semantics (`ladder.rs:53-178`), one board per grid step.
    """
    if interpret is None:  # run anywhere: interpret on CPU (hermetic tests)
        interpret = jax.default_backend() == "cpu"
    b = stones.shape[0]
    consts = jnp.asarray(_CONSTS)
    meta = jnp.zeros((b, 1, 8), jnp.int32).at[:, 0, 0].set(
        to_move.astype(jnp.int32))

    row = lambda shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    shared = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    cap, esc = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[shared((8, NP)), row((1, 1, NP)), row((1, 1, NP)),
                  row((1, 1, 8))],
        out_specs=[row((1, 1, NP)), row((1, 1, NP))],
        out_shape=[jax.ShapeDtypeStruct((b, 1, NP), jnp.int32),
                   jax.ShapeDtypeStruct((b, 1, NP), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((L, STACK_CAP, NP), jnp.int32),
            pltpu.VMEM((L, STACK_CAP, NP), jnp.int32),
            pltpu.VMEM((L, STACK_CAP, NP), jnp.int32),
            pltpu.VMEM((L, 1, STACK_CAP), jnp.int32),
        ],
        interpret=interpret,
    )(consts, stones, cid, meta)
    return cap[:, 0, :NN] > 0, esc[:, 0, :NN] > 0
