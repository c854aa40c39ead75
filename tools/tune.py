#!/usr/bin/env python3
"""Black-box tuning of search hyperparameters by engine-vs-engine matches.

Replaces `contrib/clop` (CLOP tuning of UCT_EXP / FPU_REDUCE /
SOFTMAX_TEMPERATURE / VLOSS_CNT via env overrides,
`contrib/clop/README.md:1-25`): plays candidate settings against the current
defaults with the in-process engine and climbs on win rate (simple
cross-entropy/random-search loop — the CLOP binary is external in the
reference too).

Usage: tune.py --param UCT_EXP --lo 0.8 --hi 2.4 [--games 16] [--rounds 8]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")


def play_match(value_a, value_b, param, games, sims, seed):
    """Returns wins for A playing `param=value_a` vs B at value_b."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dream_go_tpu.config import Schedule, SearchConfig
    from dream_go_tpu.go import benson, engine
    from dream_go_tpu.go import score as SC
    from dream_go_tpu.mcts import predictor as P
    from dream_go_tpu.mcts import search as S

    def cfg_with(value):
        base = SearchConfig()
        if param.upper() == "UCT_EXP":
            return base.__class__(**{**base.__dict__,
                                     "uct_exp": Schedule.constant(value)})
        if param.upper() == "FPU_REDUCE":
            return base.__class__(**{**base.__dict__,
                                     "fpu_reduce": Schedule.constant(value)})
        if param.upper() == "SOFTMAX_TEMPERATURE":
            return base.__class__(**{**base.__dict__,
                                     "softmax_temperature": value})
        raise ValueError(f"unknown param {param}")

    pred = P.random_predictor(noise=0.05)
    cfgs = {1: cfg_with(value_a), 2: cfg_with(value_b)}
    wins_a = 0
    for g in range(games):
        states = engine.new_states(1)
        a_is_black = g % 2 == 0
        for mv_no in range(120):
            color = int(np.asarray(states.to_move)[0])
            who = 1 if (color == 1) == a_is_black else 2
            trees = jax.jit(lambda st, r, c=cfgs[who]: S.search(
                st, pred, r, c, sims, None))(
                states, jax.random.PRNGKey(seed + g * 1000 + mv_no))
            mv, _ = jax.vmap(lambda t, r, c=cfgs[who]: S.best_move(
                t, r, c, jnp.float32(0.0)))(
                trees, jax.random.split(jax.random.PRNGKey(mv_no), 1))
            states = engine.step_batch(states, mv.astype(jnp.int32))
            if bool(np.asarray(states.done)[0]):
                break
        final = float(np.asarray(jax.vmap(benson.guess_score)(
            states.stones, states.chain_id, states.komi))[0])
        black_wins = final > 0
        if black_wins == a_is_black:
            wins_a += 1
    return wins_a


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--param", default="UCT_EXP")
    ap.add_argument("--lo", type=float, default=0.8)
    ap.add_argument("--hi", type=float, default=2.4)
    ap.add_argument("--games", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--sims", type=int, default=32)
    ap.add_argument("--baseline", type=float, default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    rng = np.random.default_rng(0)
    baseline = args.baseline if args.baseline is not None \
        else 0.5 * (args.lo + args.hi)
    lo, hi = args.lo, args.hi
    best, best_rate = baseline, 0.5
    for r in range(args.rounds):
        cand = float(rng.uniform(lo, hi))
        wins = play_match(cand, baseline, args.param, args.games, args.sims,
                          seed=r * 10_000)
        rate = wins / args.games
        print(f"round {r}: {args.param}={cand:.3f} vs {baseline:.3f} "
              f"-> {wins}/{args.games} ({rate:.2f})", file=sys.stderr)
        if rate > best_rate:
            best, best_rate = cand, rate
            span = (hi - lo) * 0.7
            lo = max(args.lo, cand - span / 2)
            hi = min(args.hi, cand + span / 2)
    print(f"{args.param}={best:.4f} (winrate {best_rate:.2f} vs baseline)")


if __name__ == "__main__":
    main()
