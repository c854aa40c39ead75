#!/usr/bin/env python3
"""Trainer: consume new games from shared storage, train, publish weights.

Equivalent of the reference's `contrib/distr-env/run_train.py` (dream_tf
inside the train container).  Each published generation is a complete
`dream_go.json` weights blob that workers (and GTP serving) load directly.

    python run_train.py --root /data --steps-per-gen 2000
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import dg_storage


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--num-channels", type=int, default=128)
    ap.add_argument("--num-blocks", type=int, default=9)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--steps-per-gen", type=int, default=2000)
    ap.add_argument("--min-new-games", type=int, default=256,
                    help="wait for at least this many fresh games per gen")
    ap.add_argument("--window-games", type=int, default=200_000)
    ap.add_argument("--rounds", type=int, default=0,
                    help="stop after N generations (0 = run forever)")
    ap.add_argument("--poll-seconds", type=float, default=15.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import collections

    from dream_go_tpu.config import ModelConfig, TrainConfig
    from dream_go_tpu.models import params as MP
    from dream_go_tpu.train.pipeline import ExampleSource
    from dream_go_tpu.train.train_loop import Trainer

    model_cfg = ModelConfig(num_channels=args.num_channels,
                            num_blocks=args.num_blocks)
    train_cfg = TrainConfig(batch_size=args.batch_size)
    ckpt = os.path.join(args.root, "trainer_ckpt")
    if os.path.isdir(ckpt):
        trainer = Trainer.restore(ckpt, train_cfg)
        model_cfg = trainer.model_cfg
        print(f"trainer: resumed from {ckpt}", flush=True)
    else:
        trainer = Trainer.create(model_cfg, train_cfg, seed=args.seed)

    gen, _ = dg_storage.latest_weights(args.root)
    pool: collections.deque[str] = collections.deque(
        maxlen=args.window_games)
    seen: set[str] = set()
    done = 0
    pending = 0  # fresh games accumulated since the last generation
    while args.rounds == 0 or done < args.rounds:
        fresh, seen = dg_storage.new_games(args.root, seen)
        pool.extend(fresh)
        pending += len(fresh)
        if pending < args.min_new_games:
            time.sleep(args.poll_seconds)
            continue
        pending = 0
        source = ExampleSource(list(pool), batch_size=args.batch_size,
                               seed=args.seed + done)
        metrics = trainer.fit(source, args.steps_per_gen, log_every=0)
        gen += 1
        blob = MP.dump_json(model_cfg, trainer.state.params,
                            trainer.state.batch_stats)
        path = dg_storage.publish_weights(args.root, gen, blob)
        trainer.save(os.path.abspath(ckpt))
        print(f"trainer: gen {gen} loss {metrics.get('loss', 0.0):.4f} "
              f"pool {len(pool)} -> {path}", flush=True)
        done += 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
