"""GTP protocol tests (mirrors `contrib/sanity-tests/test_suite.py` driving
the engine over GTP, with a fast fake predictor)."""

import io

import pytest

from dream_go_tpu.config import SearchConfig
from dream_go_tpu.gtp.engine import GtpEngine
from dream_go_tpu.gtp.server import run_server
from dream_go_tpu.mcts import predictor as P
from dream_go_tpu.utils import coords


@pytest.fixture(scope="module")
def engine():
    return GtpEngine(P.fake_predictor(coords.from_gtp("D4"), value=0.6),
                     SearchConfig(), num_rollout=8)


def ask(engine, line):
    resp, _ = engine.handle(line)
    return resp.strip()


class TestProtocol:
    def test_protocol_version(self, engine):
        assert ask(engine, "protocol_version") == "= 2"

    def test_id_echo(self, engine):
        assert ask(engine, "7 name") == "=7 dream_go_tpu"

    def test_known_command(self, engine):
        assert ask(engine, "known_command genmove") == "= true"
        assert ask(engine, "known_command frobnicate") == "= false"

    def test_list_commands_has_all_24(self, engine):
        resp = ask(engine, "list_commands")
        assert len(resp.splitlines()) == 24

    def test_unknown_command_errors(self, engine):
        resp = ask(engine, "frobnicate")
        assert resp.startswith("?")

    def test_boardsize(self, engine):
        assert ask(engine, "boardsize 19") == "="
        assert ask(engine, "boardsize 9").startswith("?")


class TestPlay:
    def test_play_and_showboard(self, engine):
        ask(engine, "clear_board")
        assert ask(engine, "play black q16") == "="
        board = ask(engine, "showboard")
        assert "X" in board

    def test_illegal_play_errors(self, engine):
        ask(engine, "clear_board")
        ask(engine, "play black q16")
        assert ask(engine, "play white q16").startswith("?")

    def test_undo(self, engine):
        ask(engine, "clear_board")
        ask(engine, "play black q16")
        assert ask(engine, "undo") == "="
        assert ask(engine, "play white q16") == "="
        ask(engine, "clear_board")

    def test_undo_on_empty_errors(self, engine):
        ask(engine, "clear_board")
        assert ask(engine, "undo").startswith("?")

    def test_genmove_plays_fake_point(self, engine):
        ask(engine, "clear_board")
        resp = ask(engine, "genmove black")
        assert resp == "= D4"
        # the move was actually played
        assert "X" in ask(engine, "showboard")

    def test_reg_genmove_does_not_play(self, engine):
        ask(engine, "clear_board")
        resp = ask(engine, "reg_genmove black")
        assert resp == "= D4"
        assert ask(engine, "play black d4") == "="  # still empty
        ask(engine, "clear_board")

    def test_explain_last_move(self, engine):
        ask(engine, "clear_board")
        ask(engine, "genmove black")
        resp = ask(engine, "gomill-explain_last_move")
        assert "D4" in resp
        ask(engine, "clear_board")

    def test_komi_and_time(self, engine):
        assert ask(engine, "komi 6.5") == "="
        assert ask(engine, "kgs-time_settings byoyomi 600 30 5") == "="
        assert ask(engine, "time_left black 540 5") == "="
        ask(engine, "komi 7.5")


class TestServer:
    def test_server_loop(self):
        engine = GtpEngine(P.fake_predictor(coords.from_gtp("D4")),
                           SearchConfig(), num_rollout=4)
        out = io.StringIO()
        run_server(engine,
                   infile=io.StringIO("name\nversion\nquit\nplay black a1\n"),
                   outfile=out)
        lines = [l for l in out.getvalue().splitlines() if l]
        assert lines[0] == "= dream_go_tpu"
        assert len(lines) == 3  # quit stops processing


class TestPonder:
    def test_ponder_accumulates_and_is_consumed(self):
        import time
        from dream_go_tpu.config import SearchConfig
        eng = GtpEngine(P.fake_predictor(coords.from_gtp("D4")),
                        SearchConfig(), num_rollout=8, ponder=True)
        assert ask(eng, "play black q16") == "="
        time.sleep(2.0)  # let the ponderer run a few chunks
        resp = ask(eng, "genmove white")
        assert resp == "= D4"
        eng.ponder.stop()

    def test_ponder_discards_on_mismatch(self):
        from dream_go_tpu.config import SearchConfig
        from dream_go_tpu.gtp.ponder import PonderService
        import jax, time
        from dream_go_tpu.go import engine as go_engine
        svc = PonderService(P.fake_predictor(coords.from_gtp("D4")),
                            SearchConfig(), chunk=4, capacity=64)
        s0 = go_engine.new_state()
        svc.start(s0)
        time.sleep(1.0)
        other = go_engine.step(s0, jax.numpy.int32(coords.from_gtp("Q16")))
        assert svc.take(other) is None  # position changed
        svc.start(s0)
        time.sleep(1.0)
        trees = svc.take(s0)
        assert trees is not None


class TestRegretBudget:
    """Regret-weighted budgets (`byo_yomi.rs:70-100,194-223`)."""

    def test_budget_grows_with_move_number(self):
        from dream_go_tpu.gtp.time_settings import TimeSettings
        ts = TimeSettings()
        ts.set_absolute(300.0)
        budgets = [ts.budget(1, mv) for mv in (0, 100, 200, 246)]
        assert budgets == sorted(budgets)
        assert budgets[0] > 0

    def test_endgame_fallback_and_periods(self):
        from dream_go_tpu.gtp.time_settings import TimeSettings
        ts = TimeSettings()
        ts.set_byo_yomi(60.0, 10.0, 3)
        # past the expected game end: 10% of main + one period
        assert abs(ts.budget(1, 250) - (6.0 + 10.0)) < 1e-9
        ts.remaining[1] = 0.0
        assert ts.budget(1, 250) == 10.0
        # canadian: period shared across stones
        ts2 = TimeSettings()
        ts2.set_canadian(0.0, 30.0, 10)
        assert abs(ts2.budget(1, 250) - 3.0) < 1e-9

    def test_whole_curve_spends_roughly_all_main_time(self):
        from dream_go_tpu.gtp.time_settings import TimeSettings
        ts = TimeSettings()
        ts.set_absolute(100.0)
        # simulate a 257-move game for one player, always spending the budget
        remaining = 100.0
        for mv in range(0, 257, 2):
            ts.remaining[1] = remaining
            remaining -= ts.budget(1, mv)
        assert 0.0 <= remaining < 35.0  # spends most of it, never overdraws


class TestTimedGenmove:
    """Timed play reserves UNST-N head-room and may extend the search
    (`gtp/engine.py::_maybe_extend`)."""

    def test_timed_genmove_returns_vertex_and_extends_on_instability(self):
        eng = GtpEngine(P.random_predictor(), num_rollout=24)
        assert ask(eng, "time_settings 120 0 0") == "="
        resp = ask(eng, "genmove b")
        assert resp.startswith("= ")
        # timed searches allocate extension head-room
        assert any(isinstance(k, tuple) and len(k) == 3 and k[2] > 25
                   for k in eng._search_fn)

    def test_untimed_genmove_unchanged(self):
        eng = GtpEngine(P.fake_predictor(coords.from_gtp("Q16")),
                        num_rollout=8)
        resp = ask(eng, "genmove b")
        assert resp == "= Q16"
        # no extension entries cached on the untimed path
        assert not any(isinstance(k, tuple) and k and k[0] == "unst"
                       for k in eng._search_fn)


class TestServingHygiene:
    """A 20-move timed game must not mint new compiled programs per move
    (VERDICT r1: serving-path recompiles)."""

    def test_twenty_move_game_compiles_at_most_three_searches(self):
        eng = GtpEngine(P.random_predictor(), num_rollout=64)
        assert ask(eng, "kgs-time_settings byoyomi 60 10 1") == "="
        # warmup: one genmove per color
        ask(eng, "genmove b")
        ask(eng, "genmove w")
        warm_keys = set(eng._search_fn) | set(eng._continue_fn)
        step_traces = eng._jit_step._cache_size()
        for i in range(18):
            color = "b" if i % 2 == 0 else "w"
            # drift the clock so naive budget->sims mapping would vary
            ask(eng, f"time_left {color} {50 - i} 0")
            resp = ask(eng, f"genmove {color}")
            assert resp.startswith("= ")
        new_keys = (set(eng._search_fn) | set(eng._continue_fn)) - warm_keys
        assert len(new_keys) <= 3, f"minted {len(new_keys)} programs: {new_keys}"
        # board stepping is cached once, never retraced per command
        assert eng._jit_step._cache_size() == step_traces

    def test_measured_sim_rate_feeds_budget(self):
        eng = GtpEngine(P.random_predictor(), num_rollout=512)
        assert ask(eng, "kgs-time_settings byoyomi 30 5 1") == "="
        ask(eng, "genmove b")
        ask(eng, "genmove w")
        ask(eng, "genmove b")
        # after warmup the EWMA must have moved off the conservative default
        assert eng._sims_per_sec != 500.0
        # quantization: budget-derived sims land on a bucket
        sims = eng._sims_for_budget(2)
        assert sims in eng._SIM_BUCKETS or sims == eng.num_rollout
