"""Benson's unconditional-life algorithm as vectorized fixed-point iteration.

Replaces `src/libdg_go/utils/benson.rs`.  Semantics follow the reference
exactly (which differs slightly from textbook Benson):

- *blocks* are the chains of the queried color;
- *regions* are connected components of (empty plus opponent-stone) points:
  the reference floods from empty points through anything that is not the
  queried color (`benson.rs:298-318` with `flood_fill.rs` ``stop_at`` =
  to-move color), so trapped opponent stones belong to the enclosing region;
- a region is *vital* to a block iff **every** point of the region (including
  trapped opponent stones) is adjacent to the block (`benson.rs:193-203`;
  `Block::is_liberty` delegates to ``adjacencies_of`` which yields all
  adjacent points of the chain, `board_fast.rs:154-159`);
- iterate: drop blocks with fewer than two vital healthy regions
  (`remove_non_alive_blocks`), drop regions any of whose adjacent same-color
  stones belong to a dropped block (`remove_non_surrounded_regions`), until
  stable.

The vectorized form labels empty regions by min-label propagation, builds the
[region x chain] liberty/adjacency incidence matrices with segment reductions,
and runs the removal loop as a boolean fixed point under ``lax.while_loop``.

Outputs per color: ``alive`` (stone in a pass-alive chain — `is_alive`),
``eye`` (empty point in a surviving vital region — `is_eye`).
`is_valid(p)` from the reference is simply ``~alive & ~eye``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .engine import BLACK, EMPTY, WHITE, GoState, _pad
from .score import territory, tt_score
from .topology import IOTA, NBR, NN


def label_components(mask: jax.Array) -> jax.Array:
    """int32[361]: connected-component label (min member index) of each point
    where ``mask`` holds, NN elsewhere.  Min-label propagation to fixed point."""
    init = jnp.where(mask, IOTA, NN)

    def body(carry):
        _, lbl = carry
        nbr_lbl = _pad(lbl, NN)[NBR]                       # [361, 4]
        nbr_lbl = jnp.where(_pad(mask, False)[NBR], nbr_lbl, NN)
        grown = jnp.minimum(lbl, jnp.min(nbr_lbl, axis=1))
        grown = jnp.where(mask, grown, NN)
        return jnp.any(grown != lbl), grown

    _, labels = jax.lax.while_loop(
        lambda c: c[0], body, (jnp.bool_(True), init))
    return labels


def benson(stones: jax.Array, chain_id: jax.Array, color):
    """Returns ``(alive[361], eye[361])`` boolean masks for ``color``.

    ``eye`` marks all points of surviving vital regions — empty points *and*
    trapped opponent stones, matching the reference's `is_eye`.
    """
    color = jnp.asarray(color).astype(stones.dtype)
    in_region = stones != color                             # empty or opponent
    labels = label_components(in_region)                    # [361] in [0..NN]

    # adj[p, b] = region point p is adjacent to chain b of `color`:
    # one [q, b] membership compare + four static row-gathers (avoids both
    # scatters and multi-GB rank-4 iota expansions)
    member_q = (chain_id[:, None] == IOTA[None, :]) \
        & (stones == color)[:, None]                        # [q, b]
    member_qp = jnp.concatenate([member_q, jnp.zeros((1, NN), bool)])
    adj = member_qp[NBR[:, 0]] | member_qp[NBR[:, 1]] \
        | member_qp[NBR[:, 2]] | member_qp[NBR[:, 3]]
    adj = adj & in_region[:, None]                          # [p, b] bool

    # region membership one-hot, then V/N as MXU matmuls:
    # V[r, b] = all p in r adjacent to b  <=>  sum_p member[r,p]*(1-adj[p,b])==0
    # N[r, b] = any p in r adjacent to b  <=>  sum_p member[r,p]*adj[p,b] > 0
    member = ((labels[None, :] == IOTA[:, None])
              & in_region[None, :])                         # [r, p]
    memf = member.astype(jnp.float32)
    adjf = adj.astype(jnp.float32)
    misses = jnp.dot(memf, 1.0 - adjf, preferred_element_type=jnp.float32)
    hits = jnp.dot(memf, adjf, preferred_element_type=jnp.float32)
    is_region = jnp.any(member, axis=1)                     # [r]
    vital = (misses == 0) & is_region[:, None]
    touches = hits > 0

    # fixed point: healthy regions <-> alive blocks
    healthy0 = jnp.any(vital, axis=1) & is_region           # vital to some block

    def body(carry):
        _, healthy = carry
        vital_counts = jnp.sum(vital & healthy[:, None], axis=0)     # [b]
        block_alive = vital_counts >= 2
        bad_neighbour = jnp.any(touches & ~block_alive[None, :], axis=1)
        healthy2 = healthy & ~bad_neighbour
        return jnp.any(healthy2 != healthy), healthy2

    _, healthy = jax.lax.while_loop(
        lambda c: c[0], body, (jnp.bool_(True), healthy0))

    block_alive = jnp.sum(vital & healthy[:, None], axis=0) >= 2
    alive = (stones == color) & block_alive[jnp.clip(chain_id, 0, NN - 1)]
    eye = in_region & healthy[jnp.clip(labels, 0, NN - 1)] & (labels < NN)
    return alive, eye


def is_scorable(state: GoState) -> jax.Array:
    """bool: every point is Benson-decided (`score.rs:105-117`).

    empty -> eye of either color; black stone -> pass-alive black or inside a
    white eye (dead); white stone -> pass-alive white or inside a black eye.
    """
    alive_b, eye_b = benson(state.stones, state.chain_id, BLACK)
    alive_w, eye_w = benson(state.stones, state.chain_id, WHITE)
    st = state.stones
    ok = jnp.where(
        st == EMPTY, eye_b | eye_w,
        jnp.where(st == BLACK, alive_b | eye_w, alive_w | eye_b))
    return jnp.all(ok)


def scorable_territory(state: GoState) -> jax.Array:
    """bool[361]: points Benson-decided (alive or eye) for either color
    (`score.rs:120-130` get_scorable_territory keeps points where
    ``!is_valid`` holds for black or white)."""
    alive_b, eye_b = benson(state.stones, state.chain_id, BLACK)
    alive_w, eye_w = benson(state.stones, state.chain_id, WHITE)
    decided_b = alive_b | eye_b
    decided_w = alive_w | eye_w
    return decided_b | decided_w


def clear_dead(stones: jax.Array, chain_id: jax.Array) -> jax.Array:
    """Remove all stones not unconditionally alive (`score.rs:197-211`)."""
    alive_b, _ = benson(stones, chain_id, BLACK)
    alive_w, _ = benson(stones, chain_id, WHITE)
    keep = ((stones == BLACK) & alive_b) | ((stones == WHITE) & alive_w)
    return jnp.where(keep, stones, EMPTY)


def guess_score(finished_stones: jax.Array, finished_chain_id: jax.Array,
                komi: jax.Array) -> jax.Array:
    """TT score of the board with Benson-dead stones cleared
    (`score.rs:141-147` `get_guess_score`), black minus white minus komi."""
    cleaned = clear_dead(finished_stones, finished_chain_id)
    black, white = tt_score(cleaned)
    return black.astype(jnp.float32) - white.astype(jnp.float32) - komi


# stone-status codes for SGF territory emission (`score.rs:25-52`)
STATUS_NONE, STATUS_ALIVE, STATUS_DEAD, STATUS_SEKI = 0, 1, 2, 3


def stone_status(stones: jax.Array, chain_id: jax.Array,
                 finished_stones: jax.Array, finished_chain_id: jax.Array):
    """Vectorized `get_stone_status` (`score.rs:149-185`).

    Returns ``(status[361] int8, terr[361] int8)`` where status is one of the
    STATUS_* codes for stones (NONE for empty) and terr is EMPTY/BLACK/WHITE
    ownership used for the SGF ``TB[]/TW[]`` properties and ownership labels.
    """
    alive_b, eye_b = benson(finished_stones, finished_chain_id, BLACK)
    alive_w, eye_w = benson(finished_stones, finished_chain_id, WHITE)
    cleaned = clear_dead(finished_stones, finished_chain_id)
    tb, tw = territory(cleaned)

    is_b, is_w = stones == BLACK, stones == WHITE
    status = jnp.where(
        is_b, jnp.where(alive_b, STATUS_ALIVE,
                        jnp.where(eye_w, STATUS_DEAD, STATUS_SEKI)),
        jnp.where(is_w, jnp.where(alive_w, STATUS_ALIVE,
                                  jnp.where(eye_b, STATUS_DEAD, STATUS_SEKI)),
                  STATUS_NONE)).astype(jnp.int8)
    terr = jnp.where(
        is_b, jnp.where(alive_b, BLACK, jnp.where(eye_w, WHITE, BLACK)),
        jnp.where(is_w, jnp.where(alive_w, WHITE,
                                  jnp.where(eye_b, BLACK, WHITE)),
                  jnp.where(tb, BLACK, jnp.where(tw, WHITE, EMPTY))))
    return status, terr.astype(jnp.int8)
