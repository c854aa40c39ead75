"""Large-scale differential fuzz: full random games vs the Python oracle.

Extends the 6-seed/140-move fuzz in ``test_engine.py`` to full games played
to completion, including crowded sub-board games that force heavy capture
and ko/super-ko activity (parity target: the reference validates transitions
via whole-game replays, `dg_tests/tests/real_games.rs`).

Stones and hash are compared after EVERY move; the full 362-point legal mask
(which embeds the super-ko filter) is compared periodically and whenever the
game enters a capture-dense phase.  Set ``DG_FUZZ_GAMES`` to raise the game
count (the 100-game sweep is run in CI-extended mode and before releases).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dream_go_tpu.go import engine
from dream_go_tpu.go.reference import PyBoard

NUM_GAMES = int(os.environ.get("DG_FUZZ_GAMES", "32"))
MAX_MOVES = 360


def _region_mask(rng: np.random.Generator) -> np.ndarray:
    """Half the games are confined to a small sub-board: crowded boards
    produce captures, snapbacks, and super-ko cycles at a far higher rate."""
    if rng.random() < 0.5:
        return np.ones(361, bool)
    w = int(rng.integers(5, 8))
    x0 = int(rng.integers(0, 19 - w))
    y0 = int(rng.integers(0, 19 - w))
    m = np.zeros((19, 19), bool)
    m[y0:y0 + w, x0:x0 + w] = True
    return m.reshape(361)


@pytest.mark.parametrize("seed", range(NUM_GAMES))
def test_full_random_game_matches_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    region = _region_mask(rng)
    s = engine.new_state()
    b = PyBoard()
    jit_step = jax.jit(engine.step)
    jit_mask = jax.jit(engine.legal_mask)
    jit_pseudo = jax.jit(engine.pseudo_legal_mask)
    superko_seen = 0
    for move_no in range(MAX_MOVES):
        jax_mask = np.asarray(jit_mask(s))
        if move_no % 16 == 0 or superko_seen:
            oracle_mask = b.legal_mask()
            np.testing.assert_array_equal(
                jax_mask, oracle_mask,
                err_msg=f"legal mask diverged at move {move_no} (seed {seed})")
        choices = np.flatnonzero(jax_mask[:361] & region)
        if len(choices) == 0:
            choices = np.flatnonzero(jax_mask[:361])
        if len(choices) == 0 or (b.move_count > 340 and rng.random() < 0.3):
            mv = engine.NN  # pass
        else:
            mv = int(rng.choice(choices))
            assert b.is_legal(b.to_move, mv), \
                f"oracle rejects engine-legal move {mv} at {move_no} ({seed})"
        # track super-ko rejections: a pseudo-legal point the mask forbids
        pseudo = np.asarray(jit_pseudo(s))
        superko_seen = int(np.any(pseudo & ~jax_mask[:361]))
        b.play(mv)
        s = jit_step(s, jnp.int32(mv))
        np.testing.assert_array_equal(
            np.asarray(s.stones), b.stones_array(),
            err_msg=f"stones diverged after move {move_no} (seed {seed})")
        np.testing.assert_array_equal(
            np.asarray(s.hash), np.asarray(b.hash, np.uint32),
            err_msg=f"hash diverged after move {move_no} (seed {seed})")
        if b.done:
            break
    assert bool(np.asarray(s.done)) == b.done
