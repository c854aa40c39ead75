"""Full-search self-play smoke test with fake backends."""

from dream_go_tpu.config import SearchConfig, SelfPlayConfig
from dream_go_tpu.mcts import predictor as P
from dream_go_tpu.selfplay.search_play import search_self_play
from dream_go_tpu.utils import sgf


def test_search_self_play_records_tv_and_policy():
    cfg = SelfPlayConfig(num_games=2, num_rollout=12, max_moves=6)
    games = search_self_play(P.random_predictor(), cfg,
                             SearchConfig(num_rollout=12), seed=0)
    assert len(games) == 2
    for line in games:
        parsed = sgf.parse_line(line)
        assert parsed is not None
        assert len(parsed.moves) == 6
        for mv in parsed.moves:
            assert mv.num_rollout == 12       # TV[12]
            assert mv.policy is not None      # P[...] present
            assert mv.policy.shape == (362,)
            assert mv.value is not None
