"""Tromp-Taylor scoring and territory as vectorized flood fills.

Replaces `src/libdg_go/utils/score.rs` + `flood_fill.rs`.  The reference
computes per-color BFS distance maps (`get_territory_distance`,
`score.rs:247-282`); under jit we express reachability as an iterated
dilation over the empty mask inside a ``lax.while_loop`` (converges in at
most the board diameter of the largest empty region).

Scoring (`get_tt_score`, `score.rs:220-241`): a point counts for black if it
holds a black stone or is empty and reachable from black stones only; ditto
white; empty points reachable from both (or from neither, on an empty board)
count for nobody.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .engine import BLACK, EMPTY, WHITE, GoState, _pad
from .topology import NBR, NN


def reachable(stones: jax.Array, color) -> jax.Array:
    """bool[361]: points reachable from stones of ``color`` through empties.

    Stones of ``color`` are reachable; empty points adjacent to a reachable
    point are reachable (transitively).  Equivalent to
    ``get_territory_distance(...) != 0xff`` in `score.rs:247-282`.
    """
    src = stones == jnp.asarray(color).astype(stones.dtype)
    empty = stones == EMPTY

    def body(carry):
        _, r = carry
        grown = r | (empty & jnp.any(_pad(r, False)[NBR], axis=1))
        return jnp.any(grown != r), grown

    _, out = jax.lax.while_loop(lambda c: c[0], body, (jnp.bool_(True), src))
    return out


def territory(stones: jax.Array):
    """(black_terr, white_terr) bool[361] masks of single-color territory."""
    rb = reachable(stones, BLACK)
    rw = reachable(stones, WHITE)
    empty = stones == EMPTY
    return empty & rb & ~rw, empty & rw & ~rb


def tt_score(stones: jax.Array):
    """Tromp-Taylor (black_points, white_points), komi *not* included.

    Parity with `score.rs:220-241`: on an empty board both scores are 0 (the
    reference guards on ``zobrist_hash != 0``, `score.rs:133-139`).
    """
    any_stone = jnp.any(stones != EMPTY)
    tb, tw = territory(stones)
    black = jnp.sum((stones == BLACK) | tb) * any_stone
    white = jnp.sum((stones == WHITE) | tw) * any_stone
    return black.astype(jnp.int32), white.astype(jnp.int32)


def final_score(state: GoState) -> jax.Array:
    """float32: black score minus white score minus komi (>0 = black wins)."""
    black, white = tt_score(state.stones)
    return black.astype(jnp.float32) - white.astype(jnp.float32) - state.komi


def winner(state: GoState) -> jax.Array:
    """int8: BLACK, WHITE, or EMPTY (draw) by Tromp-Taylor + komi."""
    s = final_score(state)
    return jnp.where(s > 0, jnp.int8(BLACK),
                     jnp.where(s < 0, jnp.int8(WHITE), jnp.int8(EMPTY)))
