#!/usr/bin/env python3
"""Supervised (KGS-style bootstrap) training with a held-out accuracy curve.

Reproduces the reference's human-game bootstrap measurement
(`contrib/trainer/dream_tf/model_fn.py:160-183`, `README.md:21-45`): train
``--start``-style from a big-SGF corpus of strong human games and record
policy top-1/3/5, value-sign and ownership accuracy on a HELD-OUT split
against training steps.  BASELINE.md lists this as the half of the
learning-curve target the RL run does not cover.

The only human corpus available offline is the reference's own 99-game
fixture (`src/dg_tests/fixtures/example_games.sgf`, strong pro games) —
small, so the interesting quantity is the held-out curve shape (rise then
plateau/overfit), not a KGS-scale end accuracy.

Writes one JSONL row per eval: {"step": n, "split": "holdout"|"train",
"policy_top1": ..., "policy_top3": ..., "policy_top5": ...,
"value_sign": ..., "ownership_sign": ..., "loss": ..., "learning_rate": ...}

Usage: train_supervised.py [--games PATH] [--channels 128 --blocks 9]
    [--holdout 10] [--steps 4000] [--eval-every 200] [--batch 512]
    [--ladder-features] [--metrics OUT.jsonl] [--dump WEIGHTS.json] [--cpu]
"""

import argparse
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_GAMES = "/root/reference/src/dg_tests/fixtures/example_games.sgf"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", default=DEFAULT_GAMES)
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--blocks", type=int, default=9)
    ap.add_argument("--num-samples", type=int, default=8)
    ap.add_argument("--holdout", type=int, default=10,
                    help="games held out for the accuracy curve")
    ap.add_argument("--holdout-games", default=None,
                    help="separate held-out corpus file (e.g. the 99 pro "
                    "games while training on a self-generated corpus); "
                    "overrides --holdout")
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--eval-every", type=int, default=200)
    ap.add_argument("--eval-batches", type=int, default=8)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--positions-per-game", type=int, default=8)
    ap.add_argument("--bank-games", type=int, default=0,
                    help="banked replay (0: per-batch replay)")
    ap.add_argument("--ladder-features", action="store_true")
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--dump", default=None,
                    help="write the final weights JSON here")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        cache = os.environ.get("DG_COMPILE_CACHE",
                               "/tmp/dream_go_tpu_jax_cache_tpu")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from dream_go_tpu.config import ModelConfig, TrainConfig
    from dream_go_tpu.train.pipeline import ExampleSource
    from dream_go_tpu.train.train_loop import (Trainer,
                                               policy_bias_from_lines)

    with open(args.games) as fh:
        lines = [l.strip() for l in fh if l.strip()]
    rng = random.Random(args.seed)
    rng.shuffle(lines)
    if args.holdout_games:
        with open(args.holdout_games) as fh:
            holdout = [l.strip() for l in fh if l.strip()]
        train = lines
    else:
        holdout = lines[:args.holdout]
        train = lines[args.holdout:]
    print(f"corpus: {len(train)} train / {len(holdout)} held-out games",
          file=sys.stderr)

    mcfg = ModelConfig(num_channels=args.channels, num_blocks=args.blocks,
                       num_samples=args.num_samples,
                       ladder_features=args.ladder_features)
    tcfg = TrainConfig(batch_size=args.batch)
    trainer = Trainer.create(mcfg, tcfg, seed=args.seed,
                             policy_bias=policy_bias_from_lines(train))

    mk = lambda ls, seed: ExampleSource(
        ls, batch_size=args.batch, seed=seed,
        ladder_features=args.ladder_features,
        positions_per_game=args.positions_per_game,
        bank_games=args.bank_games)
    train_src = mk(train, args.seed)
    hold_src = mk(holdout, args.seed + 1)

    out = open(args.metrics, "w") if args.metrics else None

    def emit(row):
        line = json.dumps(row)
        if out:
            out.write(line + "\n")
            out.flush()
        print(line, file=sys.stderr)

    def dump_now():
        if not args.dump:
            return
        from dream_go_tpu.models import params as MP
        tmp = args.dump + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(MP.dump_json(trainer.model_cfg, trainer.dump_params(),
                                  trainer.state.batch_stats))
        os.replace(tmp, args.dump)

    step = 0
    while step < args.steps:
        chunk = min(args.eval_every, args.steps - step)
        last = trainer.fit(train_src, num_steps=chunk, log_every=0,
                           log_fn=lambda m: None)
        step = int(trainer.state.step)
        hold = trainer.evaluate(hold_src, num_batches=args.eval_batches)
        emit({"step": step, "split": "train",
              **{k: round(float(v), 4) for k, v in last.items()}})
        emit({"step": step, "split": "holdout",
              **{k: round(float(v), 4) for k, v in hold.items()}})
        # dump at every eval: a wedged device call (remote tunnel) then
        # costs at most one eval interval, not the whole run
        dump_now()
        if trainer.scheduler.should_stop:
            print("plateau scheduler stop", file=sys.stderr)
            break
    if out:
        out.close()

    if args.dump:
        dump_now()
        print(f"dumped weights to {args.dump}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
