"""Ladder reading: curated positions + differential vs the recursive oracle
(mirrors `ladder.rs:180-351` incl. negative cases)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dream_go_tpu.go import engine, ladder
from dream_go_tpu.go.reference import PyBoard
from dream_go_tpu.utils import coords


def board_with(black=(), white=(), to_move=engine.BLACK):
    s = engine.new_state()
    b = PyBoard()
    for name in black:
        p = coords.from_gtp(name)
        s = engine.step(s.replace(to_move=jnp.int8(1)), jnp.int32(p))
        b.to_move = 1
        b.play(p)
    for name in white:
        p = coords.from_gtp(name)
        s = engine.step(s.replace(to_move=jnp.int8(2)), jnp.int32(p))
        b.to_move = 2
        b.play(p)
    s = s.replace(to_move=jnp.int8(to_move))
    b.to_move = to_move
    return s, b


def jax_capture(s, color, p):
    return bool(jax.jit(ladder.is_ladder_capture, static_argnums=2)(
        s.stones, s.chain_id, color, jnp.int32(p)))


def jax_escape(s, color, p):
    return bool(jax.jit(ladder.is_ladder_escape, static_argnums=2)(
        s.stones, s.chain_id, color, jnp.int32(p)))


class TestCapture:
    def test_edge_chase_fails_by_counter_capture(self):
        # white B2 with black A2,B3: the chase fails because black's A1
        # continuation self-ataris A1-A2 (counter-capture, ladder.rs:34-42)
        s, b = board_with(black=["A2", "B3"], white=["B2"])
        p = coords.from_gtp("C2")
        assert b.is_ladder_capture(1, p) is False
        assert jax_capture(s, 1, p) is False

    def test_textbook_diagonal_ladder_true(self):
        # white D4 between black C4/D5 with E3 support: working ladder
        s, b = board_with(black=["C4", "D5", "E3"], white=["D4"])
        p = coords.from_gtp("E4")
        assert b.is_ladder_capture(1, p) is True
        assert jax_capture(s, 1, p) is True

    def test_diagonal_ladder_works(self):
        # the classic center ladder: white D4 caught between black C4/D5
        # with black support at E3 making the chase work
        s, b = board_with(black=["C4", "D5", "E3"], white=["D4"])
        p = coords.from_gtp("E4")
        want = b.is_ladder_capture(1, p)
        assert jax_capture(s, 1, p) == want

    def test_ladder_breaker_stops_it(self):
        # same shape but a white breaker on the diagonal ahead
        s, b = board_with(black=["A2", "B3"], white=["B2", "D1"])
        p = coords.from_gtp("C2")
        want = b.is_ladder_capture(1, p)
        assert jax_capture(s, 1, p) == want

    def test_not_a_ladder_on_healthy_chain(self):
        # white group with plenty of liberties: no ladder anywhere
        s, b = board_with(black=["A1"], white=["K10", "K11"])
        p = coords.from_gtp("K12")
        assert b.is_ladder_capture(1, p) is False
        assert jax_capture(s, 1, p) is False


class TestEscape:
    def test_escape_when_ladder_fails(self):
        # black B2 in atari (white A2, B3, C2 missing); extension survives
        # when white has no working ladder
        s, b = board_with(black=["B2"], white=["A2", "B3"])
        p = coords.from_gtp("C2")  # black extends
        want = b.is_ladder_escape(1, p)
        assert jax_escape(s, 1, p) == want

    def test_not_escape_without_atari_neighbor(self):
        s, b = board_with(black=["K10"], white=["A1"])
        p = coords.from_gtp("K12")
        assert b.is_ladder_escape(1, p) is False
        assert jax_escape(s, 1, p) is False


class TestPlanes:
    def test_planes_match_oracle_on_curated_board(self):
        s, b = board_with(black=["A2", "B3", "C4", "D5", "E3"],
                          white=["B2", "D4"])
        cap, esc = ladder.ladder_planes(s)
        cap, esc = np.asarray(cap), np.asarray(esc)
        for p in range(361):
            if b.is_pseudo_legal(1, p):
                # candidate prefilter: only prefiltered points are evaluated
                adj_opp2 = any(
                    b.stones[q] == 2 and b.num_liberties(q) == 2
                    for q in _nbrs(p))
                adj_own1 = any(
                    b.stones[q] == 1 and b.num_liberties(q) == 1
                    for q in _nbrs(p))
                if adj_opp2:
                    assert cap[p] == b.is_ladder_capture(1, p), coords.to_gtp(p)
                if adj_own1:
                    assert esc[p] == b.is_ladder_escape(1, p), coords.to_gtp(p)

    @pytest.mark.parametrize("seed", [0, 1])
    def test_random_positions_differential(self, seed):
        # EXACT agreement with the branching recursive oracle — the DFS
        # explores the same branch tree (`ladder.rs:110-119`), so any
        # disagreement is a bug, not an approximation.
        rng = np.random.default_rng(seed)
        s = engine.new_state()
        b = PyBoard()
        jit_step = jax.jit(engine.step)
        for _ in range(70):
            mask = b.legal_mask()
            pts = np.flatnonzero(mask[:361])
            mv = int(rng.choice(pts))
            b.play(mv)
            s = jit_step(s, jnp.int32(mv))
        s = s.replace(to_move=jnp.int8(b.to_move))
        cap, esc = jax.jit(lambda st: ladder.ladder_planes(st, 361))(s)
        cap, esc = np.asarray(cap), np.asarray(esc)
        color = b.to_move
        checked = 0
        for p in range(361):
            if not b.is_pseudo_legal(color, p):
                continue
            if any(b.stones[q] == (3 - color) and b.num_liberties(q) == 2
                   for q in _nbrs(p)):
                assert bool(cap[p]) == b.is_ladder_capture(color, p), \
                    ("capture", coords.to_gtp(p))
                checked += 1
            if any(b.stones[q] == color and b.num_liberties(q) == 1
                   for q in _nbrs(p)):
                assert bool(esc[p]) == b.is_ladder_escape(color, p), \
                    ("escape", coords.to_gtp(p))
                checked += 1
        assert checked > 0


def _nbrs(p):
    from dream_go_tpu.go.reference import neighbors
    return neighbors(p)


def test_features_v1_full_with_ladders():
    import jax
    from dream_go_tpu.go import features
    s, b = board_with(black=["C4", "D5", "E3"], white=["D4"])
    f = np.asarray(jax.jit(
        lambda st: features.features_v1_full(st, True))(s)).reshape(361, 32)
    p = coords.from_gtp("E4")
    assert f[p, 30] == 1.0  # ladder-capture plane
    # without ladders the plane stays empty
    f0 = np.asarray(jax.jit(features.features_v1)(s)).reshape(361, 32)
    assert f0[:, 30].sum() == 0.0
