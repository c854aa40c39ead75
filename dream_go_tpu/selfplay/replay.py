"""Replay recorded games on-device to recover board states at positions.

Used by ex-it annotation, reanalyze, and the training input pipeline: games
are replayed in lockstep with a single ``lax.scan`` over the move axis, and
the state *before* each game's target move index is captured.  Replaces the
reference's per-line host replay (`utils/sgf.rs:242-297` move iteration).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..go import engine


def states_at(moves: jax.Array, target_idx: jax.Array, komi: jax.Array,
              history_len: int = 64) -> engine.GoState:
    """States before move ``target_idx`` per game.

    ``moves``: int32[G, T] action sequences padded with PASS;
    ``target_idx``: int32[G] (0 = initial position); ``komi``: f32[G].
    """
    g, t_max = moves.shape
    init = jax.vmap(lambda k: engine.new_state(0.0, history_len).replace(
        komi=k))(komi)

    def body(carry, t):
        states, saved = carry
        save_now = t == target_idx                     # [G]
        saved = jax.tree_util.tree_map(
            lambda acc, cur: jnp.where(
                save_now.reshape((g,) + (1,) * (cur.ndim - 1)), cur, acc),
            saved, states)
        states = engine.step_batch(states, moves[:, t])
        return (states, saved), None

    (final, saved), _ = jax.lax.scan(body, (init, init),
                                     jnp.arange(t_max, dtype=jnp.int32))
    # target_idx == t_max means "final position"
    saved = jax.tree_util.tree_map(
        lambda acc, cur: jnp.where(
            (target_idx == t_max).reshape((g,) + (1,) * (cur.ndim - 1)),
            cur, acc),
        saved, final)
    return saved


def final_states(moves: jax.Array, lengths: jax.Array,
                 komi: jax.Array, history_len: int = 64) -> engine.GoState:
    """States after each game's full move sequence."""
    return states_at(moves, lengths, komi, history_len)
