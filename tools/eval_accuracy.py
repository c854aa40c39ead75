#!/usr/bin/env python3
"""Held-out policy/value accuracy of dumped weights over real games.

The reference's training metrics are policy top-1/3/5 accuracy and value
sign accuracy on its input stream
(`contrib/trainer/dream_tf/model_fn.py:160-183`).  This tool measures the
same quantities on a held-out corpus the training never saw — by default
the reference's own 99-game fixture corpus of strong human games
(`src/dg_tests/fixtures/example_games.sgf`) — for one or more dumped
weights files, so an RL run's generations can be compared on data that is
not self-play.

Usage:
  python tools/eval_accuracy.py WEIGHTS.json [MORE.json ...]
      [--games example_games.sgf] [--positions-per-game 16]
      [--batch 128] [--cpu] [--seed 0]

Prints one JSON line per weights file:
  {"weights": ..., "examples": N, "top1": ..., "top3": ..., "top5": ...,
   "value_sign": ...}
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_GAMES = "/root/reference/src/dg_tests/fixtures/example_games.sgf"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("weights", nargs="+")
    ap.add_argument("--games", default=DEFAULT_GAMES)
    ap.add_argument("--positions-per-game", type=int, default=16)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dream_go_tpu.go import engine, features
    from dream_go_tpu.mcts.predictor import net_predictor
    from dream_go_tpu.models import params as MP
    from dream_go_tpu.selfplay.replay import states_at
    from dream_go_tpu.train.pipeline import parse_game

    rng = np.random.default_rng(args.seed)
    with open(args.games) as fh:
        games = [g for g in (parse_game(l) for l in fh if l.strip())
                 if g is not None]
    if not games:
        print("no parsable games", file=sys.stderr)
        return 1

    # one evaluation set for every weights file: (game row, position)
    examples = []  # (game_idx, pos, played_move, to_move_wins)
    for gi, g in enumerate(games):
        n = len(g.moves)
        for pos in rng.choice(n, size=min(args.positions_per_game, n),
                              replace=False):
            pos = int(pos)
            color = int(g.colors[pos])
            win = 0 if g.winner == 0 else (1 if g.winner == color else -1)
            examples.append((gi, pos, int(g.moves[pos]), win))

    t_max = max(len(g.moves) for g in games)
    t_max = ((t_max + 127) // 128) * 128

    replay = jax.jit(states_at, static_argnums=3)
    feats_fn = jax.jit(lambda st: features.extract_batch(st, "v1", False))

    for path in args.weights:
        with open(path) as fh:
            cfg, params = MP.load_json(fh.read())
        params = jax.tree_util.tree_map(jnp.asarray, params)
        predict = jax.jit(net_predictor(cfg, params, folded=True))

        hits = dict(top1=0, top3=0, top5=0, value=0, value_n=0)
        total = 0
        for start in range(0, len(examples), args.batch):
            chunk = examples[start:start + args.batch]
            pad = args.batch - len(chunk)
            chunk_p = chunk + [chunk[-1]] * pad
            moves = np.full((args.batch, t_max), engine.PASS, np.int32)
            tgt = np.zeros(args.batch, np.int32)
            komi = np.zeros(args.batch, np.float32)
            for row, (gi, pos, _, _) in enumerate(chunk_p):
                seq = games[gi].moves
                moves[row, :len(seq)] = seq
                tgt[row] = pos
                komi[row] = games[gi].komi
            states = replay(jnp.asarray(moves), jnp.asarray(tgt),
                            jnp.asarray(komi), 64)
            value, policy = predict(feats_fn(states))
            policy = np.asarray(policy)
            value = np.asarray(value)
            order = np.argsort(-policy, axis=-1)
            for row, (_, _, played, win) in enumerate(chunk):
                total += 1
                top = order[row]
                hits["top1"] += played == top[0]
                hits["top3"] += played in top[:3]
                hits["top5"] += played in top[:5]
                if win != 0:
                    hits["value_n"] += 1
                    pred_win = 1 if value[row] > 0.5 else -1
                    hits["value"] += pred_win == win
        print(json.dumps({
            "weights": path, "examples": total,
            "top1": round(hits["top1"] / total, 4),
            "top3": round(hits["top3"] / total, 4),
            "top5": round(hits["top5"] / total, 4),
            "value_sign": round(hits["value"] / max(hits["value_n"], 1), 4),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
