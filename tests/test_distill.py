"""Leela-zero loader round-trip + distillation pipeline."""

import numpy as np

from dream_go_tpu.config import ModelConfig, SelfPlayConfig, TrainConfig
from dream_go_tpu.mcts import predictor as P
from dream_go_tpu.models import leela_zero as LZ
from dream_go_tpu.selfplay.policy import PolicyPlayer, policy_self_play
from dream_go_tpu.train.distill import DistillationSource
from dream_go_tpu.train.pipeline import ExampleSource
from dream_go_tpu.train.train_loop import Trainer


def test_lz_weight_file_round_trip(tmp_path):
    import jax.numpy as jnp
    w = LZ.random_weights(channels=8, blocks=2, seed=1)
    path = str(tmp_path / "lz.txt")
    LZ.save_weights(w, path)
    w2 = LZ.load_weights(path)
    assert w2["channels"] == 8 and w2["num_blocks"] == 2
    x = jnp.asarray(np.random.default_rng(0)
                    .random((2, 19, 19, 18)).astype(np.float32))
    v1, p1 = LZ.forward(w, x)
    v2, p2 = LZ.forward(w2, x)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(p1).sum(-1), 1.0, atol=1e-5)


def test_distillation_trains_against_teacher():
    lines = policy_self_play(
        PolicyPlayer(P.random_predictor()),
        SelfPlayConfig(num_games=4, max_moves=36), seed=2)
    src = ExampleSource(lines, batch_size=8, seed=0, lz_history=True)
    distilled = DistillationSource(src, LZ.random_weights(8, 1))
    feats, labels = next(iter(distilled.batches(1)))
    assert labels["policy"].shape == (8, 362)
    np.testing.assert_allclose(
        np.asarray(labels["policy"]).sum(-1), 1.0, atol=1e-4)
    assert np.asarray(labels["has_ownership"]).max() == 0.0
    assert np.abs(np.asarray(labels["value"])).max() <= 1.0
    # a train step runs on distilled labels
    trainer = Trainer.create(
        ModelConfig(num_channels=8, num_blocks=1, num_samples=2),
        TrainConfig(batch_size=8), seed=0)
    metrics = trainer.fit(distilled, num_steps=2, log_every=0)
    assert np.isfinite(metrics["loss"])
