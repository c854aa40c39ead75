#!/usr/bin/env python3
"""Self-play worker: poll for the newest published weights, play games,
push them to shared storage.  Equivalent of the reference's
`contrib/distr-env/run_worker.py` (dream_go self-play inside the worker
container); here the whole game batch runs as one device program.

    python run_worker.py --root /data --games 256 --num-rollout 1600

With ``--num-rollout 1`` the worker plays policy-sampled games (the
reference's NUM_ROLLOUT=1 mode); otherwise full MCTS self-play.  Until a
first generation is published it plays from a random-init net so the
trainer has bootstrap data.
"""

from __future__ import annotations

import argparse
import os
import socket
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import dg_storage


def build_predictor(path, args):
    import jax

    from dream_go_tpu.config import ModelConfig
    from dream_go_tpu.mcts import predictor as P
    from dream_go_tpu.models import params as MP
    from dream_go_tpu.models import tower as T

    if path is not None:
        with open(path) as fh:
            cfg, params = MP.load_json(fh.read())
        params = jax.tree_util.tree_map(jax.numpy.asarray, params)
        return P.net_predictor(cfg, params, folded=True)
    cfg = ModelConfig(num_channels=args.num_channels,
                      num_blocks=args.num_blocks)
    params, stats = T.init_tower(cfg, jax.random.PRNGKey(args.seed))
    return P.net_predictor(cfg, params, stats)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--games", type=int, default=256)
    ap.add_argument("--num-rollout", type=int, default=1)
    ap.add_argument("--max-moves", type=int, default=722)
    ap.add_argument("--rounds", type=int, default=0,
                    help="stop after N batches (0 = run forever)")
    ap.add_argument("--num-channels", type=int, default=128)
    ap.add_argument("--num-blocks", type=int, default=9)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--worker-id",
                    default=f"{socket.gethostname()}-{os.getpid()}")
    args = ap.parse_args()

    from dream_go_tpu.config import SearchConfig, SelfPlayConfig

    sp_cfg = SelfPlayConfig(num_games=args.games,
                            num_rollout=args.num_rollout,
                            max_moves=args.max_moves)
    have_gen = -2  # force a first load
    predictor = None
    done = 0
    while args.rounds == 0 or done < args.rounds:
        gen, path = dg_storage.latest_weights(args.root)
        if gen != have_gen:
            predictor = build_predictor(path, args)
            have_gen = gen
            print(f"worker {args.worker_id}: weights generation {gen}",
                  flush=True)
        seed = args.seed + done * 7919 + max(gen, 0)
        if args.num_rollout <= 1:
            from dream_go_tpu.selfplay.policy import (PolicyPlayer,
                                                      policy_self_play)
            games = policy_self_play(PolicyPlayer(predictor), sp_cfg,
                                     seed=seed)
        else:
            from dream_go_tpu.selfplay.search_play import search_self_play
            games = search_self_play(predictor, sp_cfg, SearchConfig(),
                                     seed=seed)
        out = dg_storage.append_games(args.root, args.worker_id, done, games)
        print(f"worker {args.worker_id}: {len(games)} games -> {out}",
              flush=True)
        done += 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
