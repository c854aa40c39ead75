"""End-to-end behavioural sanity test: drives the *real* CLI binary over GTP
as a subprocess (the reference's `contrib/sanity-tests/test_suite.py:47-105`
strategy)."""

import os
import subprocess
import sys

import pytest


@pytest.fixture(scope="module")
def gtp():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; sys.path.insert(0, %r);"
         "from dream_go_tpu.cli import main; main(["
         "'--gtp','--num-channels','8','--num-blocks','1',"
         "'--num-samples','2','--num-rollout','8'])" % repo],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True, env=env,
        cwd=repo)

    def ask(cmd):
        proc.stdin.write(cmd + "\n")
        proc.stdin.flush()
        out = []
        while True:
            line = proc.stdout.readline()
            if line.strip() == "" and out:
                break
            if line == "":
                raise RuntimeError("engine died")
            out.append(line.rstrip("\n"))
        return "\n".join(out)

    yield ask
    try:
        proc.stdin.write("quit\n")
        proc.stdin.flush()
        proc.wait(timeout=30)
    except Exception:
        proc.kill()


def test_identifies_itself(gtp):
    assert gtp("name") == "= dream_go_tpu"
    assert gtp("protocol_version") == "= 2"


def test_plays_a_legal_game_opening(gtp):
    assert gtp("clear_board").startswith("=")
    assert gtp("komi 7.5").startswith("=")
    resp = gtp("genmove black")
    assert resp.startswith("= ")
    vertex = resp[2:]
    assert vertex == "pass" or (vertex[0] in "ABCDEFGHJKLMNOPQRST"
                                and 1 <= int(vertex[1:]) <= 19)
    # the engine's own move is on the board now; white responds
    resp2 = gtp("genmove white")
    assert resp2.startswith("= ")


def test_rejects_occupied_point(gtp):
    gtp("clear_board")
    assert gtp("play black d4").startswith("=")
    assert gtp("play white d4").startswith("?")


def test_final_score_formats(gtp):
    gtp("clear_board")
    gtp("play black d4")
    resp = gtp("final_score")
    assert resp.startswith("= ")
    assert resp[2] in "BW0"
