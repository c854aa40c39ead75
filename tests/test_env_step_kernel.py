"""Fused Pallas env-step kernel vs the XLA engine (interpret mode).

Every kernel-chosen move must be legal per `engine.legal_mask`, and the
kernel's state update must match `engine.step` field-for-field.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dream_go_tpu.go import engine
from dream_go_tpu.ops import env_step as K


@pytest.mark.parametrize("seed", [0, 1])
def test_kernel_matches_engine(seed):
    b = 4
    states = engine.new_states(b)
    shadow = engine.new_states(b)
    key = jax.random.PRNGKey(seed)
    w = jnp.ones((b, 361))
    legal_fn = jax.jit(engine.legal_mask_batch)
    step_fn = jax.jit(engine.step_batch)

    for t in range(100):
        key, sub = jax.random.split(key)
        bits = jax.random.bits(sub, (b, 361), jnp.uint32)
        mask = np.asarray(legal_fn(shadow))
        states, moves = K.env_step(states, w, seed, interpret=True,
                                   use_prng=False, rng_bits=bits)
        moves = np.asarray(moves)
        for g in range(b):
            if moves[g] < 361:
                assert mask[g, moves[g]], (t, g, moves[g])
        shadow = step_fn(shadow, jnp.asarray(moves, jnp.int32))

        np.testing.assert_array_equal(
            np.asarray(states.stones), np.asarray(shadow.stones),
            err_msg=f"stones diverged at step {t}")
        np.testing.assert_array_equal(
            np.asarray(states.chain_id), np.asarray(shadow.chain_id),
            err_msg=f"chain ids diverged at step {t}")
        np.testing.assert_array_equal(
            np.asarray(states.hash), np.asarray(shadow.hash),
            err_msg=f"hash diverged at step {t}")
        np.testing.assert_array_equal(
            np.asarray(states.hash_hist), np.asarray(shadow.hash_hist),
            err_msg=f"history diverged at step {t}")
        for field in ("placed_count", "move_count", "pass_count", "done",
                      "to_move"):
            np.testing.assert_array_equal(
                np.asarray(getattr(states, field)),
                np.asarray(getattr(shadow, field)),
                err_msg=f"{field} diverged at step {t}")
        # chain_xor rows at live chain ids
        st = np.asarray(shadow.stones)
        cid = np.asarray(shadow.chain_id)
        for g in range(b):
            live = np.unique(cid[g][st[g] != 0])
            np.testing.assert_array_equal(
                np.asarray(states.chain_xor)[g][live],
                np.asarray(shadow.chain_xor)[g][live],
                err_msg=f"chain_xor diverged at step {t} game {g}")


def test_kernel_respects_weights():
    b = 2
    states = engine.new_states(b)
    w = jnp.zeros((b, 361)).at[:, 72].set(1.0)
    bits = jax.random.bits(jax.random.PRNGKey(0), (b, 361), jnp.uint32)
    _, moves = K.env_step(states, w, 0, interpret=True, use_prng=False,
                          rng_bits=bits)
    assert (np.asarray(moves) == 72).all()


def test_kernel_passes_when_no_weighted_move():
    b = 2
    states = engine.new_states(b)
    w = jnp.zeros((b, 361))
    bits = jax.random.bits(jax.random.PRNGKey(0), (b, 361), jnp.uint32)
    ns, moves = K.env_step(states, w, 0, interpret=True, use_prng=False,
                           rng_bits=bits)
    assert (np.asarray(moves) == 361).all()
    assert (np.asarray(ns.pass_count) == 1).all()


def test_step_via_onehot_matches_engine():
    """env_step with a one-hot weight must behave like step(action)."""
    b = 3
    states = engine.new_states(b)
    actions = jnp.asarray([72, 361, 100], jnp.int32)  # incl. a pass
    onehot = (jnp.arange(361)[None, :] == actions[:, None]) \
        .astype(jnp.float32)
    bits = jax.random.bits(jax.random.PRNGKey(0), (b, 361), jnp.uint32)
    got, moves = K.env_step(states, onehot, 0, interpret=True,
                            use_prng=False, rng_bits=bits)
    want = engine.step_batch(states, actions)
    np.testing.assert_array_equal(np.asarray(moves), np.asarray(actions))
    np.testing.assert_array_equal(np.asarray(got.stones),
                                  np.asarray(want.stones))
    np.testing.assert_array_equal(np.asarray(got.pass_count),
                                  np.asarray(want.pass_count))


def test_feature_kernel_path_matches_xla_path(monkeypatch):
    """features_v1_batch(use_kernel=True) must equal the XLA path exactly."""
    from dream_go_tpu.go import features
    import dream_go_tpu.ops.libs_after as L
    # interpret mode for the kernel on CPU
    orig = L.board_features_raw
    monkeypatch.setattr(
        L, "board_features_raw",
        lambda states, interpret=True: orig(states, interpret=True))
    rng = np.random.default_rng(4)
    states = engine.new_states(3)
    step = jax.jit(engine.step_batch)
    for _ in range(50):
        masks = np.asarray(jax.jit(engine.legal_mask_batch)(states))
        moves = [int(rng.choice(np.flatnonzero(masks[g][:361])))
                 for g in range(3)]
        states = step(states, jnp.asarray(moves, jnp.int32))
    ref = np.asarray(features.features_v1_batch(states, False, False))
    got = np.asarray(features.features_v1_batch(states, False, True))
    np.testing.assert_array_equal(got, ref)
