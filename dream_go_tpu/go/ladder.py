"""Ladder reading (capture / escape feature planes).

Replaces `src/libdg_go/utils/ladder.rs:20-150`.  The reference reads ladders
recursively with board cloning; under jit we run a bounded iterative chase on
hash-free scratch boards, vectorized over a compacted candidate set:

- only points that could start a ladder are evaluated — capture candidates
  touch an opponent chain with exactly two liberties, escape candidates touch
  an own chain in atari — gathered into ``max_candidates`` lanes per board
  (the rare overflow beyond that leaves the extra points unread, a documented
  bound; the reference evaluates all 361 but exits just as fast).
- at the branch point (the chased chain keeps two liberties) the reference
  recurses into *both* liberties (`ladder.rs:110-119`); we chase the liberty
  whose one-move lookahead (attacker plays, defender extends) leaves the
  defender with the fewest liberties, which resolves the textbook zigzag
  exactly and bounds the search to a single line.  Side conditions match the
  reference: counter-capture escape (`_can_escape_with_capture`),
  immediate capture / three-liberty escape, and the attacker-self-atari
  rejection.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .engine import (
    BLACK,
    EMPTY,
    OFFBOARD,
    GoState,
    _pad,
    chain_liberties,
    place_stones,
    pseudo_legal_mask,
)
from .topology import IOTA, NBR, NN

MAX_DEPTH = 64


def _chain_mask(chain_id, cid):
    return chain_id == cid


def _liberty_info(stones, chain_id, cid):
    """(count, first, second) liberties of chain ``cid``."""
    empty = stones == EMPTY
    nbr_cid = _pad(chain_id, -1)[NBR]                    # [361, 4]
    nbr_st = _pad(stones, jnp.int8(OFFBOARD))[NBR]
    adj = jnp.any((nbr_cid == cid) & (nbr_st != EMPTY) & (nbr_st != OFFBOARD),
                  axis=1)
    libs = empty & adj
    count = jnp.sum(libs)
    first = jnp.argmax(libs)
    libs2 = libs & (IOTA != first)
    second = jnp.argmax(libs2)
    first = jnp.where(count >= 1, first, NN)
    second = jnp.where(count >= 2, second, NN)
    return count, first.astype(jnp.int32), second.astype(jnp.int32)


def _atari_neighbor_chain(stones, chain_id, p, color_of_chain):
    """First distinct chain of ``color_of_chain`` adjacent to p with 1 lib."""
    _, chain_libs = chain_liberties(stones, chain_id)
    nbr_p = jnp.asarray(NBR)[p]
    nbr_st = _pad(stones, jnp.int8(OFFBOARD))[nbr_p]
    nbr_cid = _pad(chain_id, -1)[nbr_p]
    nbr_libs = chain_libs[jnp.clip(nbr_cid, 0, NN)]
    hit = (nbr_st == color_of_chain) & (nbr_libs == 1)
    any_hit = jnp.any(hit)
    cid = jnp.where(any_hit, nbr_cid[jnp.argmax(hit)], -1)
    return cid


def _can_counter_capture(stones, chain_id, color, cid):
    """`ladder.rs:34-42`: can the (opponent-colored) chain ``cid`` capture any
    adjacent ``color`` chain in atari?"""
    _, chain_libs = chain_liberties(stones, chain_id)
    member = _chain_mask(chain_id, cid) & (stones != EMPTY)
    nbr_st = _pad(stones, jnp.int8(OFFBOARD))[NBR]       # [361, 4]
    nbr_cid = _pad(chain_id, -1)[NBR]
    nbr_libs = chain_libs[jnp.clip(nbr_cid, 0, NN)]
    color = jnp.asarray(color).astype(stones.dtype)
    target = (nbr_st == color) & (nbr_libs == 1)         # [361, 4]
    return jnp.any(member[:, None] & target)


def _pseudo_legal_point(stones, chain_id, color, p):
    """is_valid for a single point on raw arrays (board_fast.rs:216-243)."""
    _, chain_libs = chain_liberties(stones, chain_id)
    color = jnp.asarray(color).astype(stones.dtype)
    opp = (OFFBOARD - color).astype(stones.dtype)
    nbr_p = jnp.asarray(NBR)[p]
    nbr_st = _pad(stones, jnp.int8(OFFBOARD))[nbr_p]
    nbr_cid = _pad(chain_id, -1)[nbr_p]
    nbr_libs = chain_libs[jnp.clip(nbr_cid, 0, NN)]
    ok = (jnp.any(nbr_st == EMPTY)
          | jnp.any((nbr_st == color) & (nbr_libs >= 2))
          | jnp.any((nbr_st == opp) & (nbr_libs == 1)))
    return (stones[p] == EMPTY) & ok


def _chase_step(stones, chain_id, color, attack_p):
    """One rung of the ladder: attacker plays, defender extends.

    Returns (stones, chain_id, defender_cid, defender_libs, status) where
    status: 0 = continue, 1 = captured, 2 = escaped/invalid.
    """
    opp = (OFFBOARD - jnp.asarray(color)).astype(stones.dtype)
    stones, chain_id = place_stones(stones, chain_id, color, attack_p)

    # the chased chain: adjacent to attack_p, opponent color, now in atari
    cid = _atari_neighbor_chain(stones, chain_id, attack_p, opp)
    counter = _can_counter_capture(stones, chain_id, color, jnp.maximum(cid, 0))
    _, lone, _ = _liberty_info(stones, chain_id, jnp.maximum(cid, 0))
    ext_ok = (cid >= 0) & ~counter & (lone < NN) \
        & _pseudo_legal_point(stones, chain_id, opp, jnp.minimum(lone, NN - 1))

    # defender extends into the lone liberty
    ext = jnp.minimum(lone, NN - 1)
    stones2, chain_id2 = place_stones(stones, chain_id, opp, ext)
    def_cid = chain_id2[ext]
    count, _, _ = _liberty_info(stones2, chain_id2, def_cid)

    # attacker self-atari after the extension => escaped (`ladder.rs:97-106`)
    _, chain_libs2 = chain_liberties(stones2, chain_id2)
    nbr_ext = jnp.asarray(NBR)[ext]
    nbr_st = _pad(stones2, jnp.int8(OFFBOARD))[nbr_ext]
    nbr_cid = _pad(chain_id2, -1)[nbr_ext]
    nbr_libs = chain_libs2[jnp.clip(nbr_cid, 0, NN)]
    color_c = jnp.asarray(color).astype(stones.dtype)
    self_atari = jnp.any((nbr_st == color_c) & (nbr_libs == 1))

    status = jnp.where(
        ~ext_ok, 2,
        jnp.where(count == 1, 1,
                  jnp.where((count >= 3) | self_atari, 2, 0)))
    stones_out = jnp.where(ext_ok, stones2, stones)
    cid_out = jnp.where(ext_ok, chain_id2, chain_id)
    return stones_out, cid_out, def_cid, status


def _next_attack(stones, chain_id, color, def_cid):
    """Pick the chasing liberty by one-move lookahead (see module doc)."""
    _, l1, l2 = _liberty_info(stones, chain_id, def_cid)
    opp = (OFFBOARD - jnp.asarray(color)).astype(stones.dtype)

    def score(lp):
        valid = (lp < NN) & _pseudo_legal_point(
            stones, chain_id, color, jnp.minimum(lp, NN - 1))
        p = jnp.minimum(lp, NN - 1)
        s2, c2 = place_stones(stones, chain_id, color, p)
        cid = _atari_neighbor_chain(s2, c2, p, opp)
        _, lone, _ = _liberty_info(s2, c2, jnp.maximum(cid, 0))
        ext = jnp.minimum(lone, NN - 1)
        # a branch where the defender has no legal extension returns False in
        # the reference (`ladder.rs:60-80` filter) — never chase into it
        ext_ok = (cid >= 0) & (lone < NN) & _pseudo_legal_point(s2, c2, opp,
                                                               ext)
        s3, c3 = place_stones(s2, c2, opp, ext)
        cnt, _, _ = _liberty_info(s3, c3, c3[ext])
        return jnp.where(valid & ext_ok, cnt, 99)

    s1, s2 = score(l1), score(l2)
    best = jnp.where(s1 <= s2, l1, l2)
    feasible = jnp.minimum(s1, s2) < 99
    return jnp.where(feasible, best, NN).astype(jnp.int32)


def is_ladder_capture(stones, chain_id, color, p) -> jax.Array:
    """bool: playing ``color`` at ``p`` starts a winning ladder chase."""

    def cond(carry):
        _, _, attack, status, depth = carry
        return (status == 0) & (attack < NN) & (depth < MAX_DEPTH)

    def body(carry):
        st, cid, attack, _, depth = carry
        st, cid, def_cid, status = _chase_step(st, cid, color, attack)
        attack = jnp.where(status == 0,
                           _next_attack(st, cid, color, def_cid),
                           jnp.int32(NN))
        status = jnp.where((status == 0) & (attack >= NN), 2, status)
        return st, cid, attack, status, depth + 1

    init = (stones, chain_id, jnp.asarray(p, jnp.int32), jnp.int32(0),
            jnp.int32(0))
    *_, status, _ = jax.lax.while_loop(cond, body, init)
    return status == 1


def is_ladder_escape(stones, chain_id, color, p) -> jax.Array:
    """bool: playing ``color`` at ``p`` escapes an atari via a failed ladder
    for the opponent (`ladder.rs:136-178`)."""
    color_c = jnp.asarray(color).astype(stones.dtype)
    opp = (OFFBOARD - jnp.asarray(color)).astype(stones.dtype)

    # must connect to an own chain in atari
    _, chain_libs = chain_liberties(stones, chain_id)
    nbr_p = jnp.asarray(NBR)[p]
    nbr_st = _pad(stones, jnp.int8(OFFBOARD))[nbr_p]
    nbr_cid = _pad(chain_id, -1)[nbr_p]
    nbr_libs = chain_libs[jnp.clip(nbr_cid, 0, NN)]
    connected = jnp.any((nbr_st == color_c) & (nbr_libs == 1))

    st2, cid2 = place_stones(stones, chain_id, color, p)
    cnt, _, _ = _liberty_info(st2, cid2, cid2[p])
    feasible = connected & (cnt == 2)

    # the opponent must fail to ladder-capture from every adjacent point
    def check(k, safe):
        q = jnp.asarray(NBR)[p][k]
        ok = q < NN
        q = jnp.minimum(q, NN - 1)
        playable = ok & _pseudo_legal_point(st2, cid2, opp, q)
        captured = jax.lax.cond(
            playable,
            lambda: is_ladder_capture(st2, cid2, opp, q),
            lambda: jnp.bool_(False))
        return safe & ~captured

    safe = jax.lax.fori_loop(0, 4, check, jnp.bool_(True))
    return feasible & safe


def ladder_planes(state: GoState, max_candidates: int = 24):
    """(capture[361] bool, escape[361] bool) for the player to move.

    Feature planes 31/32 (`features.rs:208-222`).  Candidates beyond
    ``max_candidates`` per board are left unevaluated (False).
    """
    stones, chain_id = state.stones, state.chain_id
    color = state.to_move
    opp = (OFFBOARD - color).astype(stones.dtype)
    _, chain_libs = chain_liberties(stones, chain_id)
    pseudo = pseudo_legal_mask(state, color)

    nbr_st = _pad(stones, jnp.int8(OFFBOARD))[NBR]       # [361, 4]
    nbr_cid = _pad(chain_id, -1)[NBR]
    nbr_libs = chain_libs[jnp.clip(nbr_cid, 0, NN)]
    cap_cand = pseudo & jnp.any((nbr_st == opp) & (nbr_libs == 2), axis=1)
    esc_cand = pseudo & jnp.any((nbr_st == color) & (nbr_libs == 1), axis=1)

    cand = cap_cand | esc_cand
    order = jnp.where(cand, IOTA, NN)
    slots = jnp.sort(order)[:max_candidates]             # candidate points

    def eval_slot(q):
        valid = q < NN
        qc = jnp.minimum(q, NN - 1)
        cap = jax.lax.cond(
            valid & cap_cand[qc],
            lambda: is_ladder_capture(stones, chain_id, color, qc),
            lambda: jnp.bool_(False))
        esc = jax.lax.cond(
            valid & esc_cand[qc],
            lambda: is_ladder_escape(stones, chain_id, color, qc),
            lambda: jnp.bool_(False))
        return cap, esc

    caps, escs = jax.vmap(eval_slot)(slots)
    capture = jnp.zeros(NN, bool).at[jnp.minimum(slots, NN - 1)].max(
        caps & (slots < NN))
    escape = jnp.zeros(NN, bool).at[jnp.minimum(slots, NN - 1)].max(
        escs & (slots < NN))
    return capture, escape
