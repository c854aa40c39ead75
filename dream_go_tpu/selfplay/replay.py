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


def states_at_multi(moves: jax.Array, target_idx: jax.Array,
                    komi: jax.Array,
                    history_len: int = 64) -> engine.GoState:
    """States before ``target_idx[g, j]`` for K positions per game.

    One replay scan serves K training examples per game, so the input
    pipeline's per-batch device replay cost drops by K versus sampling one
    position per game (`states_at`).  ``target_idx``: int32[G, K];
    returns a state tree with leading axes [G, K].
    """
    g, t_max = moves.shape
    k = target_idx.shape[1]
    init = jax.vmap(lambda km: engine.new_state(0.0, history_len).replace(
        komi=km))(komi)
    init_k = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[:, None], (g, k) + x.shape[1:]), init)

    def body(carry, t):
        states, saved = carry
        save_now = t == target_idx                     # [G, K]
        saved = jax.tree_util.tree_map(
            lambda acc, cur: jnp.where(
                save_now.reshape((g, k) + (1,) * (acc.ndim - 2)),
                cur[:, None], acc),
            saved, states)
        states = engine.step_batch(states, moves[:, t])
        return (states, saved), None

    (final, saved), _ = jax.lax.scan(body, (init, init_k),
                                     jnp.arange(t_max, dtype=jnp.int32))
    saved = jax.tree_util.tree_map(
        lambda acc, cur: jnp.where(
            (target_idx == t_max).reshape((g, k) + (1,) * (acc.ndim - 2)),
            cur[:, None], acc),
        saved, final)
    return saved


def states_and_stone_history_at(moves: jax.Array, target_idx: jax.Array,
                                komi: jax.Array, history_len: int = 64,
                                depth: int = 8):
    """Like :func:`states_at`, also returning the last ``depth`` stone
    snapshots before the target (most recent first): int8[G, depth, 361].

    Used for leela-zero-compatible history features
    (`features.rs:398-470` LzFeatures).
    """
    g, t_max = moves.shape
    init = jax.vmap(lambda k: engine.new_state(0.0, history_len).replace(
        komi=k))(komi)
    hist0 = jnp.zeros((g, depth, engine.NN), jnp.int8)

    def body(carry, t):
        states, hist, saved, saved_hist = carry
        # shift the snapshot ring first: index 0 = current position
        hist = jnp.concatenate([states.stones[:, None], hist[:, :-1]], axis=1)
        save_now = t == target_idx
        saved_hist = jnp.where(save_now.reshape((g, 1, 1)), hist, saved_hist)
        saved = jax.tree_util.tree_map(
            lambda acc, cur: jnp.where(
                save_now.reshape((g,) + (1,) * (cur.ndim - 1)), cur, acc),
            saved, states)
        states = engine.step_batch(states, moves[:, t])
        return (states, hist, saved, saved_hist), None

    (states, hist, saved, saved_hist), _ = jax.lax.scan(
        body, (init, hist0, init, hist0), jnp.arange(t_max, dtype=jnp.int32))
    hist = jnp.concatenate([states.stones[:, None], hist[:, :-1]], axis=1)
    at_end = (target_idx == t_max).reshape((g, 1, 1))
    saved_hist = jnp.where(at_end, hist, saved_hist)
    saved = jax.tree_util.tree_map(
        lambda acc, cur: jnp.where(
            (target_idx == t_max).reshape((g,) + (1,) * (cur.ndim - 1)),
            cur, acc),
        saved, states)
    return saved, saved_hist


def lz_features(state: engine.GoState, stone_history: jax.Array) -> jax.Array:
    """float32[19, 19, 18] leela-zero input planes (`features.rs:398-470`).

    ``stone_history[0]`` is the position *before* the state's last move?  No:
    it is the snapshot ring captured by
    :func:`states_and_stone_history_at` — index 0 = the current position.
    Planes 0-7: to-move stones over the last 8 positions; 8-15: opponent
    stones; 16/17: constant ones for black/white to move.
    """
    me = state.to_move
    hist = stone_history.astype(jnp.int8)                  # [8, 361]
    own = (hist == me).astype(jnp.float32)
    opp = (hist == (3 - me.astype(jnp.int32)).astype(jnp.int8)) \
        .astype(jnp.float32)
    is_black = (me == engine.BLACK).astype(jnp.float32)
    ones = jnp.ones((1, engine.NN), jnp.float32)
    planes = jnp.concatenate(
        [own, opp, ones * is_black, ones * (1.0 - is_black)], axis=0)
    return planes.T.reshape(19, 19, 18)
