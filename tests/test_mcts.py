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
        cand = np.asarray(jax.vmap(S.root_candidate)(trees))
        assert not cand[:, 361].any()

    def test_tree_growth_bounded(self):
        trees = run(P.random_predictor(), sims=16)
        assert int(np.asarray(trees.size)[0]) == 17
        assert int(np.asarray(trees.node_n)[0, 0]) == 17  # root visit count


class TestTreeReuse:
    def test_reroot_preserves_subtree_stats(self):
        point = coords.from_gtp("D4")
        pred = P.fake_predictor(point)
        states = engine.new_states(2)
        trees = jax.jit(lambda st, r: S.search(
            st, pred, r, CFG, 20, None, capacity=48))(
            states, jax.random.PRNGKey(0))
        child = np.asarray(trees.root_child[:, point])
        child_n = np.asarray(trees.node_n)[np.arange(2), np.maximum(child, 0)]
        assert (child >= 0).all() and (child_n > 10).all()

        moves = jnp.full((2,), point, jnp.int32)
        new_states = engine.step_batch(states, moves)
        rr = jax.jit(jax.vmap(lambda t, a, r: S.reroot(t, a, r, CFG)))
        trees2, valid = rr(trees, moves,
                           jax.random.split(jax.random.PRNGKey(1), 2))
        assert np.asarray(valid).all()
        # the new root carries the child's visit count and state
        np.testing.assert_array_equal(np.asarray(trees2.node_n[:, 0]), child_n)
        np.testing.assert_array_equal(
            np.asarray(trees2.states.stones[:, 0]),
            np.asarray(new_states.stones))
        # parent pointers relabeled: root has none, others in range
        size = int(np.asarray(trees2.size)[0])
        parents = np.asarray(trees2.parent[0, :size])
        assert parents[0] == -1
        assert ((parents[1:] >= 0) & (parents[1:] < size)).all()

    def test_search_with_reuse_continues(self):
        point = coords.from_gtp("D4")
        pred = P.fake_predictor(point)
        states = engine.new_states(2)
        trees = jax.jit(lambda st, r: S.search(
            st, pred, r, CFG, 16, None, capacity=64))(
            states, jax.random.PRNGKey(0))
        moves = jnp.full((2,), point, jnp.int32)
        states2 = engine.step_batch(states, moves)
        trees2 = jax.jit(lambda st, t, m, r: S.search_with_reuse(
            st, t, m, pred, r, CFG, 16, None))(
            states2, trees, moves, jax.random.PRNGKey(1))
        # reused subtree + 16 new sims worth of visits at the root
        n0 = np.asarray(trees2.node_n[:, 0])
        assert (n0 >= 16).all()
        # tree stays within capacity and consistent
        assert (np.asarray(trees2.size) <= 64).all()

    def test_reuse_falls_back_when_move_unexpanded(self):
        pred = P.fake_predictor(coords.from_gtp("D4"))
        states = engine.new_states(2)
        trees = jax.jit(lambda st, r: S.search(
            st, pred, r, CFG, 8, None, capacity=32))(
            states, jax.random.PRNGKey(0))
        # play a move the search never expanded (corner A1 unlikely w/ fake)
        bad = jnp.full((2,), coords.from_gtp("T19"), jnp.int32)
        expanded = np.asarray(trees.root_child[:, coords.from_gtp("T19")])
        states2 = engine.step_batch(states, bad)
        trees2 = jax.jit(lambda st, t, m, r: S.search_with_reuse(
            st, t, m, pred, r, CFG, 8, None))(
            states2, trees, bad, jax.random.PRNGKey(1))
        # fresh fallback: the root state matches the new position either way
        np.testing.assert_array_equal(
            np.asarray(trees2.states.stones[:, 0]),
            np.asarray(states2.stones))


class TestDump:
    def test_pretty_and_sgf_dumps(self):
        from dream_go_tpu.mcts import dump as D
        point = coords.from_gtp("D4")
        trees = run(P.fake_predictor(point), sims=20)
        one = jax.tree_util.tree_map(lambda x: x[0], trees)
        pretty = D.to_pretty(one)
        assert "Nodes: 21" in pretty
        assert "D4" in pretty
        sgf_text = D.to_sgf(one)
        assert sgf_text.startswith("(;GM[1]FF[4]")
        assert "B[dp]" in sgf_text  # D4 in sgf coords


class TestRolloutBudget:
    """Per-game simulation budgets (winrate-scaled rollouts,
    `self_play.rs:218-241`)."""

    def test_budget_caps_root_visits_per_game(self):
        states = engine.new_states(3)
        budget = jnp.asarray([4, 11, 100], jnp.int32)
        pred = P.fake_predictor(coords.from_gtp("D4"))
        fn = jax.jit(lambda st, rng: S.search(
            st, pred, rng, CFG, 16, budget=budget))
        trees = fn(states, jax.random.PRNGKey(0))
        # root visit count = init visit + one per enabled simulation
        root_n = np.asarray(trees.node_n[:, 0])
        np.testing.assert_array_equal(root_n, [1 + 4, 1 + 11, 1 + 16])

    def test_budget_adaptive_matches_plain(self):
        states = engine.new_states(2)
        budget = jnp.asarray([6, 9], jnp.int32)
        pred = P.random_predictor()
        plain = jax.jit(lambda st, rng: S.search(
            st, pred, rng, CFG, 12, budget=budget))(
                states, jax.random.PRNGKey(1))
        adapt = jax.jit(lambda st, rng: S.search(
            st, pred, rng, CFG, 12, budget=budget, adaptive=True))(
                states, jax.random.PRNGKey(1))
        # budgets exhaust before the sim cap, so both paths see the same sims
        np.testing.assert_array_equal(np.asarray(plain.node_n[:, 0]),
                                      np.asarray(adapt.node_n[:, 0]))


class TestUnstN:
    def test_concentrated_search_is_stable(self):
        point = coords.from_gtp("D4")
        trees = run(P.fake_predictor(point, value=0.7), sims=24, batch=1)
        assert not bool(np.asarray(jax.vmap(S.search_unstable)(trees))[0])

    def test_value_visit_disagreement_is_unstable(self):
        point = coords.from_gtp("D4")
        trees = run(P.fake_predictor(point, value=0.7), sims=24, batch=1)
        tree = jax.tree_util.tree_map(lambda x: x[0], trees)
        # inflate the value of a lightly-visited child so the best-value
        # child no longer matches the most-visited one
        visits = np.asarray(S.root_visits(tree))
        light = next(a for a in np.argsort(visits) if 0 < visits[a])
        # inflate the edge's accumulated root-perspective value
        edge_w = tree.root_edge_w.at[int(light)].set(
            float(tree.root_edge_n[int(light)]))
        tree = tree.replace(root_edge_w=edge_w)
        assert bool(np.asarray(S.search_unstable(tree)))

    def test_adaptive_does_not_overshoot_num_sims(self):
        states = engine.new_states(1)
        pred = P.random_predictor()
        cfg = CFG
        trees = jax.jit(lambda st, rng: S.search(
            st, pred, rng, cfg, 12, adaptive=True))(
                states, jax.random.PRNGKey(0))
        assert int(np.asarray(trees.node_n[0, 0])) <= 1 + 12


def test_line_tree_deeper_than_backup_bound():
    """A pure line tree deeper than MAX_BACKUP_DEPTH stays sane: the walk
    caps at the bound (re-expanding the deepest edge), stats stay finite,
    and every simulation still contributes a root visit."""
    import numpy as np

    from dream_go_tpu.mcts import predictor as PR

    pred = PR.fake_predictor(72, value=0.6)
    states = engine.new_states(2)
    cfg = SearchConfig(dirichlet_noise=0.0)
    trees = S.search(states, pred, jax.random.PRNGKey(0), cfg, 140,
                     capacity=150)
    assert np.all(np.asarray(trees.size) == 141)
    visits = np.asarray(jax.vmap(S.root_visits)(trees)).sum(axis=1)
    assert np.all(visits == 140)
    assert np.all(np.isfinite(np.asarray(trees.node_w)))
