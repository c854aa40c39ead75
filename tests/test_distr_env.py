"""End-to-end smoke of the distr-env file contract: a worker round, a
trainer generation, and a second worker round that picks up the published
weights (`contrib/distr-env/`, mirroring the reference's worker/train
containers)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DENV = os.path.join(REPO, "contrib", "distr-env")


def run(script, *args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable, os.path.join(DENV, script), *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600)


def test_worker_then_trainer_round_trip(tmp_path):
    root = str(tmp_path)
    common = ["--root", root, "--num-channels", "8", "--num-blocks", "1"]

    # 1. worker bootstraps from a random net (no weights published yet)
    r = run("run_worker.py", *common, "--games", "4", "--rounds", "1",
            "--max-moves", "40", "--seed", "3")
    assert r.returncode == 0, r.stderr
    games_dir = os.path.join(root, "games")
    assert len(os.listdir(games_dir)) == 1
    assert "weights generation -1" in r.stdout

    # 2. trainer consumes them and publishes generation 0
    r = run("run_train.py", *common, "--batch-size", "4",
            "--steps-per-gen", "2", "--min-new-games", "2", "--rounds", "1")
    assert r.returncode == 0, r.stderr
    weights = os.listdir(os.path.join(root, "weights"))
    assert weights == ["weights_000000.json"]
    assert os.path.isdir(os.path.join(root, "trainer_ckpt"))

    # 3. a new worker picks up generation 0 and pushes more games
    r = run("run_worker.py", *common, "--games", "4", "--rounds", "1",
            "--max-moves", "40", "--seed", "4")
    assert r.returncode == 0, r.stderr
    assert "weights generation 0" in r.stdout
    assert len(os.listdir(games_dir)) == 2
