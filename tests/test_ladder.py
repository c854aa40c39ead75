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


_REF_GAMES = "/root/reference/src/dg_tests/fixtures/example_games.sgf"


@pytest.mark.skipif(not __import__("os").path.exists(_REF_GAMES),
                    reason="reference corpus not present")
def test_greedy_agreement():
    """Greedy one-line chase vs the exact branching DFS on real-game
    positions.  `tools/measure_ladder_greedy.py --sgf` measures ~97.9%
    per-candidate agreement over the reference's 99 pro games (random-board
    torture: ~96.0%) — the greedy reader misses 'either branch works'
    captures, which is why the EXACT reader is the feature-plane default
    and greedy is opt-in.  This pins the measured level on a smaller
    sample so a structural regression of the greedy chase (or a drift of
    the exact reader, which oracle tests cover directly) trips in CI."""
    rng = np.random.default_rng(3)
    from dream_go_tpu.selfplay.replay import states_at
    from dream_go_tpu.train.pipeline import parse_game

    with open(_REF_GAMES) as fh:
        games = [g for g in (parse_game(l) for l in fh if l.strip())
                 if g is not None and len(g.moves) >= 60][:48]
    t_max = max(len(g.moves) for g in games)
    t_max = ((t_max + 127) // 128) * 128
    moves = np.full((len(games), t_max), engine.PASS, np.int32)
    tgt = np.zeros(len(games), np.int32)
    komi = np.zeros(len(games), np.float32)
    for row, g in enumerate(games):
        moves[row, :len(g.moves)] = g.moves
        tgt[row] = int(rng.integers(30, len(g.moves)))
        komi[row] = g.komi
    states = jax.jit(states_at, static_argnums=3)(
        jnp.asarray(moves), jnp.asarray(tgt), jnp.asarray(komi), 64)

    planes = jax.jit(lambda st, g: jax.vmap(
        lambda s: ladder.ladder_planes(s, greedy=g))(st), static_argnums=1)
    cap_g, esc_g = map(np.asarray, planes(states, True))
    cap_x, esc_x = map(np.asarray, planes(states, False))

    # candidate prefilter (same as ladder_planes): denominate like the tool
    from dream_go_tpu.go.engine import OFFBOARD, _pad, chain_liberties
    from dream_go_tpu.go.topology import NBR

    total = agree = 0
    for i in range(len(games)):
        stones = np.asarray(states.stones[i])
        cid = np.asarray(states.chain_id[i])
        color = int(states.to_move[i])
        _, chain_libs = map(np.asarray, chain_liberties(
            jnp.asarray(stones), jnp.asarray(cid)))
        nbr_st = np.concatenate([stones, [OFFBOARD]])[NBR]
        nbr_cid = np.concatenate([cid, [-1]])[NBR]
        nbr_libs = chain_libs[np.clip(nbr_cid, 0, 361)]
        empty = stones == 0
        opp = 3 - color
        cand = empty & (np.any((nbr_st == opp) & (nbr_libs == 2), axis=1)
                        | np.any((nbr_st == color) & (nbr_libs == 1), axis=1))
        total += int(cand.sum())
        agree += int((cand & (cap_g[i] == cap_x[i])
                      & (esc_g[i] == esc_x[i])).sum())
    assert total >= 300, total
    assert agree / total >= 0.95, (agree, total)


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
