"""Fused leaf kernel vs the XLA step+features+mask path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dream_go_tpu.go import engine, features
from dream_go_tpu.ops import env_step as ES
from dream_go_tpu.ops.leaf_step import leaf_step


def _random_states(batch, moves, seed):
    rng = np.random.default_rng(seed)
    states = engine.new_states(batch)
    step_j = jax.jit(jax.vmap(engine.step))
    legal_j = jax.jit(jax.vmap(engine.legal_mask))
    for _ in range(moves):
        mask = np.asarray(legal_j(states))
        mv = []
        for b in range(batch):
            choices = np.flatnonzero(mask[b])
            mv.append(rng.choice(choices))
        states = step_j(states, jnp.asarray(mv, jnp.int32))
    return states


def _pick_actions(states, seed):
    rng = np.random.default_rng(seed)
    mask = np.asarray(jax.jit(jax.vmap(engine.legal_mask))(states))
    return jnp.asarray(
        [rng.choice(np.flatnonzero(m)) for m in mask], jnp.int32)


@pytest.mark.parametrize("moves,seed", [(0, 0), (25, 1), (90, 2)])
def test_leaf_step_matches_xla(moves, seed):
    batch = 6
    states = _random_states(batch, moves, seed)
    actions = _pick_actions(states, seed + 10)
    # make one game a pass and one a finished game
    actions = actions.at[0].set(engine.PASS)
    done_state = jax.tree_util.tree_map(
        lambda x: x[1], _random_states(1, 0, 0))
    done_state = done_state.replace(done=jnp.bool_(True))
    states = jax.tree_util.tree_map(
        lambda buf, s: buf.at[1].set(s), states, done_state)

    packed = ES.pack_states(states)
    leaf_packed, feats, cand = leaf_step(
        *packed, actions, states.komi, interpret=True)

    want_states = jax.vmap(engine.step)(states, actions)
    got_states = ES.unpack_states(states, *leaf_packed)

    np.testing.assert_array_equal(np.asarray(got_states.stones),
                                  np.asarray(want_states.stones))
    np.testing.assert_array_equal(np.asarray(got_states.to_move),
                                  np.asarray(want_states.to_move))
    np.testing.assert_array_equal(np.asarray(got_states.hash),
                                  np.asarray(want_states.hash))
    np.testing.assert_array_equal(np.asarray(got_states.hash_hist),
                                  np.asarray(want_states.hash_hist))
    np.testing.assert_array_equal(np.asarray(got_states.pass_count),
                                  np.asarray(want_states.pass_count))
    np.testing.assert_array_equal(np.asarray(got_states.done),
                                  np.asarray(want_states.done))
    np.testing.assert_array_equal(np.asarray(got_states.last_two),
                                  np.asarray(want_states.last_two))
    # chain ids must induce the same partition (representatives may differ
    # only if merge order differed -- both use min-member, so exact)
    np.testing.assert_array_equal(np.asarray(got_states.chain_id),
                                  np.asarray(want_states.chain_id))
    np.testing.assert_array_equal(np.asarray(got_states.chain_xor),
                                  np.asarray(want_states.chain_xor))

    want_feats = np.asarray(jax.vmap(
        lambda s: features.features_v1(s))(want_states))
    got_feats = np.asarray(feats)[:, :, :361].transpose(0, 2, 1) \
        .reshape(batch, 19, 19, 32)
    mismatch = np.argwhere(got_feats != want_feats)
    assert mismatch.size == 0, mismatch[:20]

    from dream_go_tpu.go.options import standard_mask

    want_cand = np.asarray(jax.vmap(standard_mask)(want_states))
    np.testing.assert_array_equal(np.asarray(cand), want_cand[:, :361])


def test_fused_search_matches_xla_search():
    """The fused driver must produce the same tree statistics as XLA."""
    from dream_go_tpu.config import ModelConfig, SearchConfig
    from dream_go_tpu.mcts import predictor as PR
    from dream_go_tpu.mcts import search as S
    from dream_go_tpu.models import tower as T

    mcfg = ModelConfig(num_channels=8, num_blocks=1)
    params, stats = T.init_tower(mcfg, jax.random.PRNGKey(0))
    pred = PR.net_predictor(mcfg, params, stats)
    states = _random_states(4, 12, 3)
    rng = jax.random.PRNGKey(7)

    cfg_x = SearchConfig(dirichlet_noise=0.0)
    cfg_f = SearchConfig(dirichlet_noise=0.0, fused=True)
    tx = S.search(states, pred, rng, cfg_x, 24)
    tf = S.search(states, pred, rng, cfg_f, 24)

    np.testing.assert_array_equal(np.asarray(jax.vmap(S.root_visits)(tx)),
                                  np.asarray(jax.vmap(S.root_visits)(tf)))
    np.testing.assert_allclose(np.asarray(jax.vmap(S.root_q)(tx)),
                               np.asarray(jax.vmap(S.root_q)(tf)),
                               rtol=0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(tx.slot_action),
                                  np.asarray(tf.slot_action))
    np.testing.assert_array_equal(np.asarray(tx.slot_child),
                                  np.asarray(tf.slot_child))
    np.testing.assert_array_equal(np.asarray(tx.root_child),
                                  np.asarray(tf.root_child))
    # the packed tree states round-trip to the same boards
    got = S.unpack_rows(jax.vmap(lambda t: jax.tree_util.tree_map(
        lambda b: b[0], t.states))(tf))
    np.testing.assert_array_equal(
        np.asarray(got.stones),
        np.asarray(jax.vmap(lambda t: t.states.stones[0])(tx)))
