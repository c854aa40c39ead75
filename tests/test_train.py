"""Training subsystem: pipeline batches, train step, plateau scheduler."""

import numpy as np

from dream_go_tpu.config import ModelConfig, SelfPlayConfig, TrainConfig
from dream_go_tpu.mcts import predictor as P
from dream_go_tpu.selfplay.policy import PolicyPlayer, policy_self_play
from dream_go_tpu.train.lr_schedule import LearningRateScheduler
from dream_go_tpu.train.pipeline import ExampleSource, parse_game
from dream_go_tpu.train.train_loop import Trainer

MODEL = ModelConfig(num_channels=16, num_blocks=1, num_samples=2)
TRAINC = TrainConfig(batch_size=8)


def _lines():
    player = PolicyPlayer(P.random_predictor())
    return policy_self_play(
        player, SelfPlayConfig(num_games=4, max_moves=40), seed=11)


class TestPipeline:
    def test_parse_game_appends_passes(self):
        lines = _lines()
        g = parse_game(lines[0])
        assert g is not None
        # scored games end with two passes
        assert g.moves[-1] == 361 and g.moves[-2] == 361

    def test_batches_have_expected_shapes(self):
        src = ExampleSource(_lines(), batch_size=8, seed=0)
        feats, labels = next(iter(src.batches(1)))
        assert feats.shape == (8, 19, 19, 32)
        assert labels["policy"].shape == (8, 362)
        np.testing.assert_allclose(
            np.asarray(labels["policy"]).sum(axis=-1), 1.0, atol=1e-3)
        assert set(np.unique(np.asarray(labels["value"]))) <= {-1.0, 0.0, 1.0}
        assert labels["ownership"].shape == (8, 361)
        assert np.asarray(labels["has_ownership"]).max() == 1.0

    def test_multi_position_batches(self):
        """K positions per replayed game: same shapes, valid labels, and
        every example's features match the K=1 replay of that position."""
        lines = _lines()
        for use_native in (False, True):
            src = ExampleSource(lines, batch_size=8, seed=0, augment=False,
                                positions_per_game=4, use_native=use_native)
            assert src.positions_per_game == 4
            feats, labels = next(iter(src.batches(1)))
            assert feats.shape == (8, 19, 19, 32)
            np.testing.assert_allclose(
                np.asarray(labels["policy"]).sum(axis=-1), 1.0, atol=1e-3)

    def test_banked_batches(self):
        """Banked mode: one replay serves every batch; shapes and label
        invariants match the per-batch path, and draws differ across
        batches (the bank is sampled, not iterated)."""
        src = ExampleSource(_lines(), batch_size=8, seed=0,
                            positions_per_game=4, bank_games=6)
        batches = list(src.batches(3))
        assert src._bank is not None
        assert src._bank[0].shape[0] == 6 * 4
        for feats, labels in batches:
            assert feats.shape == (8, 19, 19, 32)
            np.testing.assert_allclose(
                np.asarray(labels["policy"]).sum(axis=-1), 1.0, atol=1e-3)
        a, b = np.asarray(batches[0][0]), np.asarray(batches[1][0])
        assert not np.array_equal(a, b)

    def test_states_at_multi_matches_single(self):
        import jax.numpy as jnp

        from dream_go_tpu.selfplay.replay import states_at, states_at_multi
        g = parse_game(_lines()[0])
        n = min(len(g.moves), 24)
        moves = jnp.asarray(g.moves[:n][None, :].repeat(3, axis=0))
        komi = jnp.full((3,), 7.5, jnp.float32)
        targets = jnp.asarray(np.array([[0, 5, n], [3, 3, 1], [n, 2, 7]],
                                       np.int32))
        multi = states_at_multi(moves, targets, komi)
        for j in range(3):
            single = states_at(moves, targets[:, j], komi)
            np.testing.assert_array_equal(np.asarray(multi.stones[:, j]),
                                          np.asarray(single.stones))
            np.testing.assert_array_equal(np.asarray(multi.to_move[:, j]),
                                          np.asarray(single.to_move))
            np.testing.assert_array_equal(np.asarray(multi.hash[:, j]),
                                          np.asarray(single.hash))


class TestTrainer:
    def test_train_steps_reduce_loss(self):
        src = ExampleSource(_lines(), batch_size=8, seed=1, augment=False)
        trainer = Trainer.create(MODEL, TRAINC, seed=0)
        first = trainer.fit(src, num_steps=1, log_every=0)
        for _ in range(3):
            last = trainer.fit(src, num_steps=5, log_every=0)
        assert np.isfinite(last["loss"])
        assert int(trainer.state.step) == 16
        assert {"policy_top1", "value_accuracy",
                "ownership_accuracy"} <= set(last)

    def test_checkpoint_round_trip(self, tmp_path):
        src = ExampleSource(_lines(), batch_size=8, seed=2, augment=False)
        trainer = Trainer.create(MODEL, TRAINC, seed=0)
        trainer.fit(src, num_steps=2, log_every=0)
        path = str(tmp_path / "ckpt")
        trainer.save(path)
        restored = Trainer.restore(path)
        assert int(restored.state.step) == 2
        assert restored.model_cfg.num_channels == 16
        # restored state continues training
        restored.fit(src, num_steps=1, log_every=0)
        assert int(restored.state.step) == 3


class TestScheduler:
    def test_decreasing_loss_keeps_lr(self):
        sched = LearningRateScheduler(3e-4)
        for i in range(3000):
            sched.update(1.0 - 1e-4 * i)
        assert sched.learning_rate == 3e-4

    def test_plateau_divides_by_three(self):
        sched = LearningRateScheduler(3e-4)
        rng = np.random.default_rng(0)
        for _ in range(3000):
            sched.update(1.0 + 0.001 * rng.standard_normal())
        assert sched.learning_rate < 3e-4
        np.testing.assert_allclose(sched.learning_rate, 1e-4, rtol=1e-6)

    def test_stops_below_min(self):
        sched = LearningRateScheduler(1e-6)
        rng = np.random.default_rng(0)
        for _ in range(3000):
            sched.update(1.0 + 0.001 * rng.standard_normal())
        assert sched.should_stop


def test_heatmap_renders(tmp_path):
    import numpy as np
    from dream_go_tpu.train.heatmap import heat_image, save_heat_image
    stones = np.zeros(361, np.int8)
    stones[180] = 1
    stones[182] = 2
    heat = np.zeros(361, np.float32)
    heat[200] = 0.8
    heat[220] = -0.6
    img = heat_image(stones, heat)
    assert img.shape == (304, 304, 3) and img.dtype == np.uint8
    # red-ish cell for positive heat, blue-ish for negative
    cell = img[10 * 16 + 8, 10 * 16 + 8]  # point 200 = (x=10, y=10)
    assert cell[0] > cell[2]
    cell = img[11 * 16 + 8, 11 * 16 + 8]  # point 220 = (x=11, y=11)
    assert cell[2] > cell[0]
    save_heat_image(str(tmp_path / "x.png"), stones, heat)
    assert (tmp_path / "x.png").exists()


def test_distributed_helpers_single_process():
    from dream_go_tpu.parallel import distributed as D
    D.initialize()  # no-op standalone
    start, count = D.local_game_slice(100)
    assert (start, count) == (0, 100)


def test_v2_feature_training_end_to_end():
    """A V2-feature model trains on self-play data (18-plane pipeline)."""
    from dream_go_tpu.config import SelfPlayConfig
    from dream_go_tpu.mcts import predictor as P
    from dream_go_tpu.selfplay.policy import PolicyPlayer, policy_self_play

    lines = policy_self_play(
        PolicyPlayer(P.random_predictor()),
        SelfPlayConfig(num_games=3, max_moves=32), seed=13)
    src = ExampleSource(lines, batch_size=4, seed=0, feature_set="v2")
    feats, labels = next(iter(src.batches(1)))
    assert feats.shape == (4, 19, 19, 18)
    trainer = Trainer.create(
        ModelConfig(num_channels=8, num_blocks=1, num_samples=2,
                    num_features=18, feature_set="v2"),
        TrainConfig(batch_size=4), seed=0)
    metrics = trainer.fit(src, num_steps=2, log_every=0)
    assert np.isfinite(metrics["loss"])


def test_max_norm_projection_bounds_conv_columns():
    import jax
    import jax.numpy as jnp
    from dream_go_tpu.train.train_loop import (init_state,
                                               normalize_conv_kernels)

    state = init_state(ModelConfig(num_channels=16, num_blocks=1),
                       jax.random.PRNGKey(0))

    def check(path, w):
        if any(getattr(k, "key", None) == "kernel" for k in path) \
                and w.ndim == 4:
            n = np.linalg.norm(np.asarray(w).reshape(-1, w.shape[-1]), axis=0)
            assert np.all(n <= 1.0 / np.sqrt(w.shape[-1]) + 1e-5), path

    jax.tree_util.tree_map_with_path(check, state.params)
    # projection is idempotent
    again = normalize_conv_kernels(state.params)
    for a, b in zip(jax.tree_util.tree_leaves(again),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_policy_bias_from_lines(sample_lines=None):
    import jax
    from dream_go_tpu.train.train_loop import (policy_bias_from_lines,
                                               set_policy_bias, init_state)

    lines = _lines()
    bias = policy_bias_from_lines(lines)
    assert bias.shape == (362,)
    assert np.all(bias < 0)  # log probabilities
    # moves that occur in the data get a larger (less negative) bias
    probs = np.exp(bias)
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-5)

    state = init_state(ModelConfig(num_channels=16, num_blocks=1),
                       jax.random.PRNGKey(0), policy_bias=bias)
    got = np.asarray(state.params["policy"]["linear_1"]["bias"])
    np.testing.assert_allclose(got, bias, atol=1e-6)
