"""Model tests: shapes, BN folding equivalence, weights-JSON round trip.

Mirrors the reference layer tests (`contrib/trainer/dream_tf/layers/test_*.py`)
plus dump/load parity (`loader.rs:118-142`)."""

import jax
import jax.numpy as jnp
import numpy as np

from dream_go_tpu.config import ModelConfig
from dream_go_tpu.models import params as P
from dream_go_tpu.models import tower as T

CFG = ModelConfig(num_channels=16, num_blocks=2, num_samples=4)


def _random_input(batch=4, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        (rng.random((batch, 19, 19, CFG.num_features)) < 0.3)
        .astype(np.float32))


def test_forward_shapes_and_ranges():
    params, stats = T.init_tower(CFG, jax.random.PRNGKey(0))
    x = _random_input()
    out, _ = T.apply_tower(CFG, params, stats, x)
    assert out.policy_logits.shape == (4, 362)
    assert out.value.shape == (4,)
    assert out.ownership.shape == (4, 361)
    assert np.all(np.abs(np.asarray(out.value)) <= 1.0)
    assert np.all(np.abs(np.asarray(out.ownership)) <= 1.0)
    assert out.policy_logits.dtype == jnp.float32


def test_train_mode_updates_batch_stats():
    params, stats = T.init_tower(CFG, jax.random.PRNGKey(0))
    x = _random_input()
    _, new_stats = T.apply_tower(CFG, params, stats, x, train=True)
    before = np.asarray(stats["upsample"]["bn"]["mean"])
    after = np.asarray(new_stats["upsample"]["bn"]["mean"])
    assert not np.array_equal(before, after)


def test_folding_matches_eval_forward():
    params, stats = T.init_tower(CFG, jax.random.PRNGKey(1))
    # make running stats non-trivial
    for _ in range(3):
        _, stats = T.apply_tower(CFG, params, stats, _random_input(seed=9),
                                 train=True)
    x = _random_input(seed=2)
    ref, _ = T.apply_tower(CFG, params, stats, x)
    folded = P.fold_params(CFG, params, stats)
    folded = jax.tree_util.tree_map(jnp.asarray, folded)
    got = T.Tower(CFG, folded=True).apply({"params": folded}, x)
    np.testing.assert_allclose(np.asarray(got.value), np.asarray(ref.value),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(got.policy_logits),
                               np.asarray(ref.policy_logits), atol=8e-2)


def test_dump_load_round_trip():
    params, stats = T.init_tower(CFG, jax.random.PRNGKey(3))
    text = P.dump_json(CFG, params, stats)
    cfg2, loaded = P.load_json(text)
    assert cfg2.num_channels == CFG.num_channels
    assert cfg2.num_blocks == CFG.num_blocks
    assert cfg2.num_samples == CFG.num_samples

    x = _random_input(seed=4)
    folded = jax.tree_util.tree_map(jnp.asarray, P.fold_params(CFG, params, stats))
    want = T.Tower(CFG, folded=True).apply({"params": folded}, x)
    loaded = jax.tree_util.tree_map(jnp.asarray, loaded)
    got = T.Tower(CFG, folded=True).apply({"params": loaded}, x)
    # f16 serialization tolerance
    np.testing.assert_allclose(np.asarray(got.value),
                               np.asarray(want.value), atol=2e-2)
    np.testing.assert_allclose(np.asarray(got.policy_logits),
                               np.asarray(want.policy_logits), atol=8e-2)
    np.testing.assert_allclose(np.asarray(got.ownership),
                               np.asarray(want.ownership), atol=2e-2)


def test_remat_gradients_match():
    """cfg.remat recomputes activations without changing grads
    (reference recompute_grad.py:25-56 equivalence)."""
    import jax
    import jax.numpy as jnp

    from dream_go_tpu.config import ModelConfig
    from dream_go_tpu.models import tower as T

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 19, 19, 32))
    sums = []
    for remat in (False, True):
        cfg = ModelConfig(num_channels=8, num_blocks=2, remat=remat)
        params, stats = T.init_tower(cfg, jax.random.PRNGKey(0))

        def loss(p, cfg=cfg):
            out, _ = T.apply_tower(cfg, p, stats, x, train=True)
            return jnp.sum(out.policy_logits ** 2) + jnp.sum(out.value ** 2)

        g = jax.grad(loss)(params)
        sums.append(float(jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)))
    assert sums[0] == sums[1]
