"""`tools/lz_decode2sgf.py`: leela-zero chunk -> big-SGF conversion.

Differential test: synthesize leela-zero training chunks from oracle-replayed
games, run our converter AND the reference's converter
(`/root/reference/tools/lz_decode2sgf.py`, executed as an opaque subprocess),
and require byte-identical output.  Also checks the reconstructed SGF replays
to the original final position.
"""

import importlib.util
import io
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dream_go_tpu.go.reference import PyBoard
from dream_go_tpu.utils import sgf as sgf_mod

_REF_TOOL = "/root/reference/tools/lz_decode2sgf.py"


def _load_ours():
    spec = importlib.util.spec_from_file_location(
        "lz_decode2sgf",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "lz_decode2sgf.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _random_game(seed: int, moves: int):
    """Random legal no-pass game; returns the list of played points and the
    stone snapshot (bool black[361], bool white[361]) after each move."""
    rng = np.random.default_rng(seed)
    b = PyBoard()
    played, snaps = [], []
    for _ in range(moves):
        mask = b.legal_mask()
        pts = np.nonzero(mask[:361])[0]
        if len(pts) == 0:
            break
        p = int(rng.choice(pts))
        b.play(p)
        played.append(p)
        stones = b.stones_array()
        snaps.append((stones == 1, stones == 2))
    return played, snaps


def _chunk_lines(snaps, policies, values):
    """Render leela-zero 19-line records for each position of a game.

    Record t describes the position after move t+1 with history planes:
    8 planes of to-move-player stones (now, -1, ..., -7), 8 planes of
    opponent stones, a to-move flag ('0' = black), policy, value.
    """
    out = []
    for t in range(len(snaps)):
        to_move = (t + 1) % 2  # 0 = black to move after an odd move count
        for player in range(2):
            color = to_move if player == 0 else 1 - to_move
            for back in range(8):
                i = t - back
                plane = snaps[i][color] if i >= 0 else np.zeros(361, bool)
                bits = np.packbits(
                    np.concatenate([plane, np.zeros(3, bool)]))
                out.append(bits.tobytes().hex()[:91])
        out.append("0" if to_move == 0 else "1")
        out.append(" ".join("%.6f" % x for x in policies[t]))
        out.append("%.1f" % values[t])
    return "\n".join(out) + "\n"


def _synthesize(seed):
    rng = np.random.default_rng(seed + 1000)
    played, snaps = _random_game(seed, moves=24)
    policies = rng.random((len(snaps), 362)).astype(np.float32)
    values = rng.choice([-1.0, 1.0], len(snaps))
    return played, snaps, _chunk_lines(snaps, policies, values)


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_reference_tool_output(seed):
    if not os.path.exists(_REF_TOOL):
        pytest.skip("reference tool not available")
    _, _, chunk = _synthesize(seed)

    ours = io.StringIO()
    _load_ours().main(io.StringIO(chunk), ours)

    theirs = subprocess.run([sys.executable, _REF_TOOL], input=chunk,
                            capture_output=True, text=True, timeout=120)
    assert theirs.returncode == 0, theirs.stderr[-2000:]
    assert ours.getvalue() == theirs.stdout


def test_reconstructed_sgf_replays_to_same_position():
    played, snaps, chunk = _synthesize(2)
    out = io.StringIO()
    _load_ours().main(io.StringIO(chunk), out)
    lines = [l for l in out.getvalue().splitlines() if l]
    # consecutive records form one continuing game
    assert len(lines) == 1
    game = sgf_mod.parse_line(lines[0])
    assert game is not None

    b = PyBoard()
    for mv in game.moves:
        b.play(mv.point)
    stones = b.stones_array()
    black, white = snaps[-1]
    np.testing.assert_array_equal(stones == 1, black)
    np.testing.assert_array_equal(stones == 2, white)
    # policy annotations are attached to every continuation move
    assert lines[0].count("P[") == len(played) - 1
