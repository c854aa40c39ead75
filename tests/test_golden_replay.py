"""Golden replay test: fixture games must reproduce pinned final hashes.

The reference pins pro-game replays to exact zobrist hashes
(`dg_tests/tests/real_games.rs:26-76`); here the fixtures are self-play
games with final hashes pinned at fixture-creation time, guarding the
engine's transition function against regressions.
"""

import ast
import os

import jax
import jax.numpy as jnp
import numpy as np

from dream_go_tpu.go import engine
from dream_go_tpu.utils import sgf

_DIR = os.path.dirname(os.path.abspath(__file__))


def test_fixture_games_replay_to_golden_hashes():
    goldens = ast.literal_eval(
        open(os.path.join(_DIR, "fixtures", "golden_hashes.txt")).read())
    lines = [l.strip() for l in
             open(os.path.join(_DIR, "fixtures", "sample_games.sgf"))
             if l.strip()]
    assert len(lines) == len(goldens)
    step = jax.jit(engine.step)
    for line, golden in zip(lines, goldens):
        game = sgf.parse_line(line)
        s = engine.new_state(game.komi)
        for mv in game.moves:
            s = step(s.replace(to_move=jnp.int8(mv.color)),
                     jnp.int32(mv.point))
        np.testing.assert_array_equal(
            np.asarray(s.hash), np.asarray(golden, np.uint32))
