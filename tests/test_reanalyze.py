"""Reanalyze / ex-it annotation over real self-play output."""

import numpy as np

from dream_go_tpu.config import SearchConfig, SelfPlayConfig
from dream_go_tpu.mcts import predictor as P
from dream_go_tpu.selfplay.policy import PolicyPlayer, policy_self_play
from dream_go_tpu.selfplay.reanalyze import ex_it, reanalyze
from dream_go_tpu.selfplay.replay import states_at
from dream_go_tpu.utils import sgf


def _make_games():
    player = PolicyPlayer(P.random_predictor())
    return policy_self_play(
        player, SelfPlayConfig(num_games=2, max_moves=30), seed=3)


def test_states_at_replays_consistently():
    import jax, jax.numpy as jnp
    from dream_go_tpu.go import engine
    lines = _make_games()
    game = sgf.parse_line(lines[0])
    moves = np.asarray([[m.point for m in game.moves]], np.int32)
    # replay to position 10 via scan, compare against sequential stepping
    st = states_at(jnp.asarray(moves), jnp.asarray([10], np.int32),
                   jnp.asarray([game.komi], np.float32))
    ref = engine.new_state(game.komi)
    for mv in game.moves[:10]:
        ref = engine.step(ref, jnp.int32(mv.point))
    np.testing.assert_array_equal(np.asarray(st.stones[0]),
                                  np.asarray(ref.stones))
    np.testing.assert_array_equal(np.asarray(st.hash[0]),
                                  np.asarray(ref.hash))


def test_reanalyze_patches_annotations():
    lines = _make_games()
    out = reanalyze(lines, P.random_predictor(), SearchConfig(),
                    num_sims=8, fraction=0.5, seed=1, )
    assert len(out) == len(lines)
    patched = 0
    for line in out:
        game = sgf.parse_line(line)
        assert game is not None
        for mv in game.moves:
            if mv.num_rollout == 8:
                patched += 1
                assert mv.policy is not None
    assert patched > 0


def test_ex_it_runs():
    lines = _make_games()
    out = ex_it(lines, P.random_predictor(), SearchConfig(), num_sims=8,
                fraction=0.5, seed=2)
    assert len(out) == len(lines)
    for line in out:
        assert sgf.parse_line(line) is not None


def test_parse_survives_parens_in_b85_blobs():
    # regression: b85 alphabet contains '(' and ')'; the variation stripper
    # must not treat them as SGF variation markers
    import numpy as np
    from dream_go_tpu.utils import b85
    rng = np.random.default_rng(0)
    for _ in range(5):
        pol = rng.random(362).astype(np.float16)
        blob = b85.encode(pol)
        if "(" in blob or ")" in blob:
            break
    assert "(" in blob or ")" in blob, "test vector should contain parens"
    line = (f"(;GM[1]FF[4]KM[7.5]RE[B+0.5];B[pd]TV[25]P[{blob}]V[0.1]"
            f";W[dd]TV[25]P[{blob}]V[-0.1];B[]V[0.2])")
    g = sgf.parse_line(line)
    assert len(g.moves) == 3
    assert g.moves[2].point == 361  # pass
    np.testing.assert_array_equal(g.moves[0].policy, pol)
