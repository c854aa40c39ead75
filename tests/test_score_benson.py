"""Scoring + Benson tests replicating the reference's own cases
(`src/libdg_go/utils/score.rs:283-406`, `benson.rs` semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from dream_go_tpu.go import benson as bn
from dream_go_tpu.go import engine, score
from dream_go_tpu.utils import coords


def board_with(black=(), white=()):
    """Build a state by direct placement (alternating fill via step)."""
    s = engine.new_state(komi=0.5)
    # interleave with passes so colors land where we want
    for p in black:
        s = s.replace(to_move=jnp.int8(engine.BLACK))
        s = engine.step(s, jnp.int32(coords.point(*p)))
    for p in white:
        s = s.replace(to_move=jnp.int8(engine.WHITE))
        s = engine.step(s, jnp.int32(coords.point(*p)))
    return s.replace(pass_count=jnp.int32(0), done=jnp.bool_(False))


class TestTTScore:
    def test_empty_board_scores_zero(self):
        s = engine.new_state()
        b, w = jax.jit(score.tt_score)(s.stones)
        assert int(b) == 0 and int(w) == 0

    def test_single_black_stone_takes_all(self):
        # score.rs:296-303 score_black: one black stone -> (361, 0)
        s = board_with(black=[(0, 0)])
        b, w = jax.jit(score.tt_score)(s.stones)
        assert (int(b), int(w)) == (361, 0)

    def test_single_white_stone_takes_all(self):
        s = board_with(white=[(0, 0)])
        b, w = jax.jit(score.tt_score)(s.stones)
        assert (int(b), int(w)) == (0, 361)

    def test_walled_corner(self):
        # score.rs:316-335 score_black_white: white walled corner -> (353, 8)
        s = board_with(
            white=[(1, 0), (0, 1), (1, 1), (1, 2), (0, 3), (1, 3)],
            black=[(2, 0), (2, 1), (2, 2), (2, 3), (0, 4), (1, 4), (2, 4)])
        b, w = jax.jit(score.tt_score)(s.stones)
        assert (int(b), int(w)) == (353, 8)

    def test_checker_board_stripes(self):
        # score.rs:337-349: stripes of black every other column -> (361, 0)
        pts = [(x, y) for y in range(19) for x in range(19) if x % 2 == 1]
        s = board_with(black=pts)
        b, w = jax.jit(score.tt_score)(s.stones)
        assert (int(b), int(w)) == (361, 0)


class TestBenson:
    def test_stripes_are_scorable(self):
        pts = [(x, y) for y in range(19) for x in range(19) if x % 2 == 1]
        s = board_with(black=pts)
        assert bool(jax.jit(bn.is_scorable)(s))

    def test_single_stone_not_scorable(self):
        s = board_with(black=[(0, 0)])
        assert not bool(jax.jit(bn.is_scorable)(s))

    def test_two_eye_group_alive(self):
        # score.rs:365-405 eyes_should_be_territory: white group with eyes at
        # (1,0) and (3,0); black stone trapped at (0,0); lone black at (9,9)
        s = board_with(
            white=[(0, 1), (1, 1), (2, 0), (2, 1), (3, 1), (4, 0), (4, 1)],
            black=[(0, 0), (9, 9)])
        jb = jax.jit(bn.benson, static_argnums=2)
        alive_w, eye_w = jb(s.stones, s.chain_id, engine.WHITE)
        alive_b, eye_b = jb(s.stones, s.chain_id, engine.BLACK)
        aw, ew = np.asarray(alive_w), np.asarray(eye_w)
        # the white group is pass-alive
        for p in [(0, 1), (1, 1), (2, 0), (2, 1), (3, 1), (4, 0), (4, 1)]:
            assert aw[coords.point(*p)], p
        # both eyes (incl. the trapped black stone at (0,0)) are white eyes
        for p in [(1, 0), (3, 0), (0, 0)]:
            assert ew[coords.point(*p)], p
        # the lone black stone is not alive and not inside a white eye
        assert not np.asarray(alive_b)[coords.point(9, 9)]
        assert not ew[coords.point(9, 9)]

    def test_stone_status_matches_reference_case(self):
        s = board_with(
            white=[(0, 1), (1, 1), (2, 0), (2, 1), (3, 1), (4, 0), (4, 1)],
            black=[(0, 0), (9, 9)])
        status, terr = jax.jit(bn.stone_status)(
            s.stones, s.chain_id, s.stones, s.chain_id)
        status, terr = np.asarray(status), np.asarray(terr)
        # white stones: alive + white territory
        for p in [(0, 1), (2, 0), (4, 1)]:
            assert status[coords.point(*p)] == bn.STATUS_ALIVE
            assert terr[coords.point(*p)] == engine.WHITE
        # trapped black at (0,0): dead + white territory
        assert status[coords.point(0, 0)] == bn.STATUS_DEAD
        assert terr[coords.point(0, 0)] == engine.WHITE
        # lone black at (9,9): seki + black territory
        assert status[coords.point(9, 9)] == bn.STATUS_SEKI
        assert terr[coords.point(9, 9)] == engine.BLACK
        # eye points are white territory
        assert terr[coords.point(1, 0)] == engine.WHITE
        assert terr[coords.point(3, 0)] == engine.WHITE

    def test_guess_score_clears_dead(self):
        s = board_with(
            white=[(0, 1), (1, 1), (2, 0), (2, 1), (3, 1), (4, 0), (4, 1)],
            black=[(0, 0), (9, 9)])
        g = float(jax.jit(bn.guess_score)(s.stones, s.chain_id, s.komi))
        # after clearing: only the white group remains -> white owns the board
        assert g == -(361.0 + 0.5)
