"""Native C++ extractor vs the Python pipeline (differential)."""

import numpy as np
import pytest

from dream_go_tpu import native
from dream_go_tpu.config import SelfPlayConfig
from dream_go_tpu.mcts import predictor as P
from dream_go_tpu.selfplay.policy import PolicyPlayer, policy_self_play
from dream_go_tpu.train import pipeline

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


@pytest.fixture(scope="module")
def lines():
    player = PolicyPlayer(P.random_predictor())
    return policy_self_play(
        player, SelfPlayConfig(num_games=3, max_moves=40), seed=21)


def test_native_matches_python_parse(lines):
    out = native.extract_batch(lines, seed=7)
    assert out["valid"].all()
    for i, line in enumerate(lines):
        g = pipeline.parse_game(line)
        assert out["num_moves"][i] == len(g.moves)
        np.testing.assert_array_equal(
            out["moves"][i, :len(g.moves)], g.moves)
        assert out["komi"][i] == g.komi
        # label parity at the natively-chosen position
        pos = int(out["targets"][i])
        labels = pipeline.make_labels(g, pos)
        np.testing.assert_allclose(out["policy"][i], labels["policy"],
                                   atol=2e-3)
        assert out["value"][i] == labels["value"]
        np.testing.assert_array_equal(out["ownership"][i],
                                      labels["ownership"])
        assert out["has_ownership"][i] == labels["has_ownership"]


def test_native_rejects_short_and_garbage(lines):
    out = native.extract_batch(
        ["(;GM[1]KM[7.5];B[aa];W[bb])", "not an sgf at all", lines[0]],
        seed=1)
    assert list(out["valid"]) == [False, False, True]


def test_policy_sums_to_one(lines):
    out = native.extract_batch(lines, seed=3)
    np.testing.assert_allclose(out["policy"].sum(axis=1), 1.0, atol=1e-3)
