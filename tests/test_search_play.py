"""Full-search self-play smoke test with fake backends."""

from dream_go_tpu.config import SearchConfig, SelfPlayConfig
from dream_go_tpu.mcts import predictor as P
from dream_go_tpu.selfplay.search_play import (search_self_play,
                                               search_self_play_continuous)
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


def test_continuous_batching_produces_legal_complete_games():
    """Continuous refill: a 3-slot batch completes 7 games; every game is a
    fresh episode (legal from the empty board under the oracle, no state
    leaking across slot reuse) with full annotations."""
    from dream_go_tpu.go.reference import PyBoard

    cfg = SelfPlayConfig(num_games=7, num_rollout=8, max_moves=12,
                         winrate_rollouts=False)
    games = search_self_play_continuous(
        P.random_predictor(), cfg, SearchConfig(num_rollout=8), seed=3,
        batch=3, refill_every=4)
    assert len(games) == 7
    for line in games:
        parsed = sgf.parse_line(line)
        assert parsed is not None
        assert 1 <= len(parsed.moves) <= cfg.max_moves
        board = PyBoard()
        for mv in parsed.moves:
            assert board.is_legal(mv.color, mv.point), (mv.color, mv.point)
            board.play(mv.point)
            assert mv.policy is not None and mv.value is not None


def test_continuous_deadline_stops_early():
    """``deadline_s`` (the bench's fixed-window mode) returns the games
    completed so far instead of running to ``num_games``."""
    cfg = SelfPlayConfig(num_games=10_000, num_rollout=4, max_moves=10,
                         winrate_rollouts=False)
    stats = {}
    games = search_self_play_continuous(
        P.random_predictor(), cfg, SearchConfig(num_rollout=4), seed=5,
        batch=2, refill_every=2, deadline_s=5.0, stats=stats)
    assert len(games) < 10_000  # stopped by the clock, not the target
    for line in games:
        assert sgf.parse_line(line) is not None
    # the bench's steady-state instrumentation: one (time, active games,
    # charged sims) event per search move, monotone in time
    events = stats["move_events"]
    assert len(events) >= 1
    times = [t for t, _, _ in events]
    assert times == sorted(times)
    for _, active, charged in events:
        assert 0 <= active <= 2
        assert charged == active * cfg.num_rollout
