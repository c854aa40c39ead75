#!/usr/bin/env python3
"""Sustained full-search self-play throughput (games/s and sims/s).

The reference's headline self-play rate is ~0.02 games/s at 1600
rollouts/move on its GPU setup (`/root/reference/README.md:61-64`, worker
threads pull a fresh game as each finishes).  This measures the TPU-native
equivalent: `search_self_play_continuous` keeps the device batch full of
live games, so the number reported here is the steady-state production
rate, not a single lockstep batch with a long idle tail.

Protocol (tunnel-safe): one small warmup run compiles + loads every device
program, then the timed run is measured wall-to-wall.  Simulation counts
come from the emitted TV[n] annotations (budgeted sims actually charged per
recorded move), so sims/s is a lower bound (moves of unfinished episodes at
the cutoff are not counted).

Usage: bench_selfplay.py [--weights W.json] [--channels 128 --blocks 9]
    [--batch 1024] [--rollout 1600] [--games 64] [--warmup-games 4] [--cpu]
"""

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TV_RE = re.compile(r"TV\[(\d+)\]")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights")
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--blocks", type=int, default=9)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--rollout", type=int, default=1600)
    ap.add_argument("--games", type=int, default=64)
    ap.add_argument("--warmup-games", type=int, default=4)
    ap.add_argument("--capacity", type=int, default=0,
                    help="tree node cap (0: 2*rollout reuse default)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--deadline", type=float, default=None,
                    help="stop after this many wall seconds even if fewer "
                         "games completed (fixed-window mode)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        import os as _os
        cache = _os.environ.get("DG_COMPILE_CACHE",
                                "/tmp/dream_go_tpu_jax_cache_tpu")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from dream_go_tpu.config import (ModelConfig, SearchConfig,
                                     SelfPlayConfig)
    from dream_go_tpu.mcts.predictor import net_predictor
    from dream_go_tpu.selfplay.search_play import search_self_play_continuous

    if args.weights:
        from dream_go_tpu.models import params as MP
        with open(args.weights) as fh:
            cfg, params = MP.load_json(fh.read())
        params = jax.tree_util.tree_map(jnp.asarray, params)
        predictor = net_predictor(cfg, params, folded=True)
    else:
        from dream_go_tpu.models import tower as T
        cfg = ModelConfig(num_channels=args.channels, num_blocks=args.blocks)
        params, stats = T.init_tower(cfg, jax.random.PRNGKey(0))
        predictor = net_predictor(cfg, params, stats)

    # production stack on chips: fused leaf kernel + EARLY-C adaptive stop
    sc = SearchConfig(num_rollout=args.rollout,
                      max_nodes=args.capacity).resolve_auto()

    # ONE continuous run: compiles + the cold batch-maturation ramp (a fresh
    # batch completes nothing until its first games reach game length), then
    # a steady-state window.  The production quantity is the steady rate —
    # finished slots are continuously refilled, so after the ramp the
    # completion stream is stationary; `warmup_games` sets the ramp cutoff.
    total = args.warmup_games + args.games
    sp = SelfPlayConfig(num_games=total, num_rollout=args.rollout)
    game_times: list = []
    t0 = time.time()
    games = search_self_play_continuous(predictor, sp, sc, seed=args.seed,
                                        batch=args.batch,
                                        game_times=game_times,
                                        deadline_s=args.deadline)
    dt = time.time() - t0

    sims = sum(int(m) for g in games for m in _TV_RE.findall(g))
    moves = sum(len(_TV_RE.findall(g)) for g in games)
    steady = None
    if len(game_times) > args.warmup_games + 1:
        window = game_times[args.warmup_games:]
        span = window[-1] - window[0]
        if span > 0:
            steady = (len(window) - 1) / span
    print(json.dumps({
        "games": len(games), "seconds": round(dt, 1),
        "games_per_sec_wall": round(len(games) / dt, 4),
        "games_per_sec_steady": round(steady, 4) if steady else None,
        "ramp_games": args.warmup_games,
        "moves": moves, "sims": sims,
        "sims_per_sec_wall": round(sims / dt, 1),
        "batch": args.batch, "rollout": args.rollout,
        "net": args.weights or f"{args.channels}x{args.blocks}-random",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
