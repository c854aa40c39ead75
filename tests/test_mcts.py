"""Batched MCTS behaviour under fake backends (the reference's device-less
strategy: `lib.rs:226-282`, `predictors/{fake,random,nan}.rs`)."""

import jax
import jax.numpy as jnp
import numpy as np

from dream_go_tpu.config import SearchConfig
from dream_go_tpu.go import engine
from dream_go_tpu.mcts import predictor as P
from dream_go_tpu.mcts import search as S
from dream_go_tpu.utils import coords

CFG = SearchConfig()


def run(predictor, sims=24, batch=2, use_scoring=None):
    states = engine.new_states(batch)
    fn = jax.jit(lambda st, rng: S.search(st, predictor, rng, CFG, sims,
                                          use_scoring))
    return fn(states, jax.random.PRNGKey(0))


class TestSearch:
    def test_fake_predictor_concentrates_visits(self):
        point = coords.from_gtp("D4")
        trees = run(P.fake_predictor(point), sims=24)
        visits = np.asarray(jax.vmap(S.root_visits)(trees))
        assert visits.shape == (2, 362)
        # nearly all simulations should go through the fake point
        assert visits[:, point].min() >= 20
        assert int(np.asarray(trees.size)[0]) == 25

    def test_best_move_greedy_picks_fake_point(self):
        point = coords.from_gtp("Q16")
        trees = run(P.fake_predictor(point), sims=24)
        act, val = jax.vmap(
            lambda t, r: S.best_move(t, r, CFG, jnp.float32(0.0))
        )(trees, jax.random.split(jax.random.PRNGKey(1), 2))
        assert np.all(np.asarray(act) == point)
        assert np.all(np.asarray(val) > 0.0)

    def test_random_predictor_spreads_visits(self):
        trees = run(P.random_predictor(), sims=32)
        visits = np.asarray(jax.vmap(S.root_visits)(trees))[0]
        assert (visits > 0).sum() >= 8  # exploration spreads over many moves

    def test_nan_predictor_is_contained(self):
        # NaN evaluations must not poison the tree: all values sanitized,
        # search still returns a move (reference returns pass, lib.rs:226-282)
        trees = run(P.nan_predictor(), sims=8)
        assert np.isfinite(np.asarray(trees.node_w)).all()
        act, _ = jax.vmap(
            lambda t, r: S.best_move(t, r, CFG, jnp.float32(0.0))
        )(trees, jax.random.split(jax.random.PRNGKey(1), 2))
        assert np.all((np.asarray(act) >= 0) & (np.asarray(act) <= 361))

    def test_softmax_targets_normalized(self):
        trees = run(P.random_predictor(), sims=16)
        targets = np.asarray(jax.vmap(S.softmax_targets)(trees))
        np.testing.assert_allclose(targets.sum(axis=-1), 1.0, atol=1e-5)

    def test_backup_values_propagate(self):
        # a constant-value predictor must produce that value at the root
        trees = run(P.fake_predictor(coords.from_gtp("D4"), value=0.7),
                    sims=16)
        root_mean = np.asarray(trees.node_w[:, 0] / trees.node_n[:, 0])
        # root accumulates 1-0.7 from odd plies and 0.7 from even plies;
        # either way it stays within [0.3, 0.7]
        assert np.all(root_mean >= 0.29) and np.all(root_mean <= 0.71)

    def test_scoring_mask_forbids_pass_at_root(self):
        trees = run(P.random_predictor(), sims=8, batch=2,
                    use_scoring=jnp.ones((2,), bool))
        cand = np.asarray(trees.candidate)[:, 0]  # root candidates
        assert not cand[:, 361].any()

    def test_tree_growth_bounded(self):
        trees = run(P.random_predictor(), sims=16)
        assert int(np.asarray(trees.size)[0]) == 17
        assert int(np.asarray(trees.node_n)[0, 0]) == 17  # root visit count
