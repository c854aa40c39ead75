"""Greedy scorer: roll a position out to a scorable state by policy argmax.

Replaces `src/libdg_mcts/greedy_score.rs:33-70`: repeatedly play the
highest-probability ScoringSearch candidate (no pass, no eye fills) until the
board is scorable or nothing remains, capped at 722 moves; used by GTP
``final_score`` and reanalyze for unfinished games.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..go import benson as bn
from ..go import engine, features
from ..go.options import scoring_mask
from ..mcts.predictor import Predictor


def greedy_rollout(states: engine.GoState, predictor: Predictor,
                   max_moves: int = 722,
                   ladder_features: bool = False) -> engine.GoState:
    """Batched greedy play until every board is scorable (or the cap).

    ``ladder_features`` must match the predictor's input contract — a net
    trained with planes 30/31 sees garbage (zeros) otherwise, skewing the
    dead-stone cleanup the final score depends on.
    """

    def step_fn(carry):
        states, done, n = carry
        feats = features.extract_batch(states, "v1", ladder_features)
        _, policy = predictor(feats)
        mask = jax.vmap(scoring_mask)(states)
        masked = jnp.where(mask, policy, -jnp.inf)
        has_move = jnp.any(mask, axis=1)
        moves = jnp.where(has_move, jnp.argmax(masked, axis=1),
                          engine.PASS).astype(jnp.int32)
        moves = jnp.where(done, engine.PASS, moves)
        new_states = engine.step_batch(states, moves)
        scorable = jax.vmap(bn.is_scorable)(new_states)
        done = done | scorable | ~has_move
        return new_states, done, n + 1

    def cond_fn(carry):
        _, done, n = carry
        return (~jnp.all(done)) & (n < max_moves)

    batch = states.stones.shape[0]
    init_scorable = jax.vmap(bn.is_scorable)(states)
    out, _, _ = jax.lax.while_loop(
        cond_fn, step_fn, (states, init_scorable, jnp.int32(0)))
    return out


def greedy_score(states: engine.GoState, predictor: Predictor,
                 ladder_features: bool = False) -> jax.Array:
    """f32[B]: black-minus-white-minus-komi after greedy completion +
    Benson clearing (`get_guess_score`)."""
    finished = greedy_rollout(states, predictor,
                              ladder_features=ladder_features)
    return jax.vmap(bn.guess_score)(finished.stones, finished.chain_id,
                                    states.komi)
