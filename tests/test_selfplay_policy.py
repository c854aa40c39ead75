"""End-to-end policy self-play with test predictors (device-less strategy:
fake/random/NaN predictors, like the reference's `lib.rs:226-282`)."""

import jax
import jax.numpy as jnp
import numpy as np

from dream_go_tpu.config import SelfPlayConfig
import dream_go_tpu.mcts.choose as C
from dream_go_tpu.mcts import predictor as P
from dream_go_tpu.selfplay.policy import PolicyPlayer, policy_self_play
from dream_go_tpu.utils import sgf


class TestChoose:
    def test_concentrates_on_best(self):
        items = jnp.asarray([[0.7, 0.1, 0.1, 0.1]])
        picks = [int(C.choose(jax.random.PRNGKey(i), items)[0]) for i in range(20)]
        assert all(p == 0 for p in picks)  # 0.7 covers >= 50% of the mass

    def test_cutoff_drops_tail(self):
        items = jnp.asarray([[0.3, 0.3, 0.2, 0.1, 0.1]])
        picks = {int(C.choose(jax.random.PRNGKey(i), items)[0])
                 for i in range(200)}
        assert picks <= {0, 1}  # entries below the 50% threshold are dropped

    def test_zero_mass_falls_back_to_last(self):
        items = jnp.asarray([[0.0, 0.0, 0.0]])
        assert int(C.choose(jax.random.PRNGKey(0), items)[0]) == 2

    def test_nan_policy_falls_back(self):
        items = jnp.full((1, 362), jnp.nan)
        assert int(C.choose(jax.random.PRNGKey(0), items)[0]) == 361


class TestPolicySelfPlay:
    CFG = SelfPlayConfig(num_games=4, max_moves=260, komi=7.5)

    def test_random_games_complete_and_parse(self):
        player = PolicyPlayer(P.random_predictor())
        games = policy_self_play(player, self.CFG, seed=1)
        assert len(games) == 4
        for line in games:
            assert line.startswith("(;GM[1]FF[4]")
            parsed = sgf.parse_line(line)
            assert parsed is not None
            assert parsed.komi == 7.5
            assert len(parsed.moves) >= 2
            # values recorded per move
            assert parsed.moves[0].value is not None

    def test_nan_predictor_passes_immediately(self):
        # all-NaN search must degrade to passing, `lib.rs:226-282`
        player = PolicyPlayer(P.nan_predictor())
        games = policy_self_play(
            player, SelfPlayConfig(num_games=2, max_moves=40), seed=0)
        for line in games:
            parsed = sgf.parse_line(line)
            assert all(m.point == 361 for m in parsed.moves)

    def test_sym_average_equivalent_for_uniform(self):
        base = P.random_predictor()
        feats = jnp.zeros((2, 19, 19, 32))
        v1, p1 = base(feats)
        v2, p2 = P.symmetrize(base)(feats)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)
