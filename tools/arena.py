#!/usr/bin/env python3
"""Engine-vs-engine arena over RL-loop generation checkpoints.

Plays batched lockstep matches between the per-generation weight dumps an
RL run leaves in its out dir (``weights_%04d.json``) and fits Elo ratings
over the results — the learning-curve measurement the reference gets from
uploading generations to its REST server and CGOS (`README.md:80-93`,
`tools/sgf2elo.py`).

Both networks evaluate every position (one batched forward each); the
policy of the side to move is selected per game, colors alternate with the
game index, and games are scored by Benson clearing + Tromp-Taylor like
self-play records.  The move function takes both parameter sets as traced
inputs, so every pairing reuses one compiled program.

Usage: arena.py OUT_DIR [--games 32] [--max-pair-gap 4] [--cpu]
       [--sgf-out FILE]
"""

import argparse
import itertools
import json
import math
import re
import sys

sys.path.insert(0, "/root/repo")


def load_gen_weights(out_dir):
    """[(gen, folded_params, model_cfg)] for every weights_*.json."""
    import glob
    import os

    import jax.numpy as jnp
    from jax import tree_util

    from dream_go_tpu.models import params as MP

    out = []
    for path in sorted(glob.glob(os.path.join(out_dir, "weights_*.json"))):
        gen = int(re.search(r"weights_(\d+)\.json$", path).group(1))
        cfg, params = MP.load_json(open(path).read())
        params = tree_util.tree_map(jnp.asarray, params)
        out.append((gen, params, cfg))
    return out


def build_move_fn(model_cfg, temperature=0.7, cutoff=0.5):
    import jax
    import jax.numpy as jnp

    from dream_go_tpu.go import benson as bn
    from dream_go_tpu.go import engine, features
    from dream_go_tpu.go.options import scoring_mask
    from dream_go_tpu.mcts.choose import choose
    from dream_go_tpu.models import tower as T

    def net(params, feats):
        out, _ = T.apply_tower(model_cfg, params, None, feats,
                               train=False, folded=True)
        return (out.value + 1.0) * 0.5, jax.nn.softmax(out.policy_logits,
                                                       axis=-1)

    @jax.jit
    def move_fn(wa, wb, states, rng):
        b = states.stones.shape[0]
        feats = features.extract_batch(states, "v1", False)
        va, pa = net(wa, feats)
        vb, pb = net(wb, feats)
        a_black = (jnp.arange(b) % 2) == 0
        a_moves = jnp.where(a_black, states.to_move == 1,
                            states.to_move == 2)
        policy = jnp.where(a_moves[:, None], pa, pb)
        value = jnp.where(a_moves, va, vb)

        scorable = jax.vmap(bn.is_scorable)(states)
        std_mask = engine.legal_mask_batch(states)
        scoring = jax.vmap(scoring_mask)(states)
        mask = jnp.where(scorable[:, None], std_mask, scoring)
        masked = jnp.where(mask, policy, 0.0)
        move = choose(rng, masked, cutoff, temperature)
        move = jnp.where(states.done, engine.PASS, move)
        return engine.step_batch(states, move.astype(jnp.int32)), move, value

    @jax.jit
    def territory(states):
        return jax.vmap(bn.stone_status)(
            states.stones, states.chain_id, states.stones, states.chain_id)[1]

    return move_fn, territory


def build_search_move_fn(model_cfg, rollouts, temperature=0.7, cutoff=0.5,
                         temperature_moves=8):
    """MCTS move function: each side searches with ITS OWN net.

    The search-play Elo the reference's strength story is based on
    (`README.md:80-93`, CGOS games are engine searches, not raw policy).
    Each move runs a fresh batched search; the leaf predictor evaluates
    both nets and selects per game by which player is to move at the root
    (both nets pay the forward cost — fine for rating runs).  First
    ``temperature_moves`` moves sample with temperature for opening
    diversity, then LCB-greedy like GTP play.
    """
    import jax
    import jax.numpy as jnp

    from dream_go_tpu.config import SearchConfig
    from dream_go_tpu.go import benson as bn
    from dream_go_tpu.go import engine
    from dream_go_tpu.mcts import search as S
    from dream_go_tpu.models import tower as T

    scfg = SearchConfig(num_rollout=rollouts,
                        ladder_features=model_cfg.ladder_features,
                        ).resolve_auto()

    def net(params, feats):
        out, _ = T.apply_tower(model_cfg, params, None, feats,
                               train=False, folded=True)
        return ((out.value + 1.0) * 0.5,
                jax.nn.softmax(out.policy_logits, axis=-1))

    @jax.jit
    def move_fn(wa, wb, states, rng):
        b = states.stones.shape[0]
        a_black = (jnp.arange(b) % 2) == 0
        a_to_search = jnp.where(a_black, states.to_move == 1,
                                states.to_move == 2)

        def predictor(feats):
            va, pa = net(wa, feats)
            vb, pb = net(wb, feats)
            return (jnp.where(a_to_search, va, vb),
                    jnp.where(a_to_search[:, None], pa, pb))

        scorable = jax.vmap(bn.is_scorable)(states)
        use_scoring = ~scorable & ~states.done
        k_search, k_move = jax.random.split(rng)
        trees = S.search(states, predictor, k_search, scfg, rollouts,
                         use_scoring, adaptive=scfg.adaptive)
        temp = jnp.where(states.move_count < temperature_moves,
                         jnp.float32(temperature), 0.0)
        move, value = jax.vmap(
            lambda t, r, tm: S.best_move(t, r, scfg, tm)
        )(trees, jax.random.split(k_move, b), temp)
        move = jnp.where(states.done, engine.PASS, move)
        return engine.step_batch(states, move.astype(jnp.int32)), move, value

    return move_fn


def play_pair(move_fn, territory_fn, wa, wb, name_a, name_b, games, seed,
              komi=7.5, max_moves=722):
    """SGF lines for `games` lockstep games of A vs B (colors alternate)."""
    import jax
    import numpy as np

    from dream_go_tpu.go import engine

    states = engine.new_states(games, komi=komi)
    key = jax.random.PRNGKey(seed)
    for _ in range(max_moves):
        key, sub = jax.random.split(key)
        states, _, _ = move_fn(wa, wb, states, sub)
        if bool(np.all(np.asarray(states.done))):
            break

    terr = np.asarray(territory_fn(states))
    out = []
    for g in range(games):
        black = float((terr[g] == 1).sum())
        white = float((terr[g] == 2).sum()) + komi
        res = f"B+{black - white:.1f}" if black > white \
            else f"W+{white - black:.1f}" if white > black else "0"
        pb, pw = (name_a, name_b) if g % 2 == 0 else (name_b, name_a)
        out.append(f"(;GM[1]FF[4]SZ[19]KM[{komi:.1f}]PB[{pb}]PW[{pw}]"
                   f"RE[{res}])")
    return out


def fit_elo(lines):
    """{name: rating} by logistic MLE (same fit as tools/sgf2elo.py)."""
    pat_b = re.compile(r"PB\[([^\]]*)\]")
    pat_w = re.compile(r"PW\[([^\]]*)\]")
    pat_r = re.compile(r"RE\[([BW])")
    games = []
    rating = {}
    for line in lines:
        b, w, r = pat_b.search(line), pat_w.search(line), pat_r.search(line)
        if not (b and w and r):
            continue
        games.append((b.group(1), w.group(1),
                      1.0 if r.group(1) == "B" else 0.0))
        rating.setdefault(b.group(1), 0.0)
        rating.setdefault(w.group(1), 0.0)
    names = sorted(rating)
    for _ in range(2000):
        grad = {n: 0.0 for n in names}
        for b, w, s in games:
            p = 1.0 / (1.0 + 10 ** ((rating[w] - rating[b]) / 400.0))
            grad[b] += s - p
            grad[w] -= s - p
        for n in names:
            rating[n] += 8.0 * grad[n] / max(1, len(games))
        anchor = rating[names[0]]
        for n in names:
            rating[n] -= anchor
    return rating


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--games", type=int, default=32)
    ap.add_argument("--max-pair-gap", type=int, default=4,
                    help="play gen i vs j only when j - i <= this "
                         "(plus power-of-two long links)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--sgf-out", help="also write match SGF lines here")
    ap.add_argument("--rollouts", type=int, default=0,
                    help="rate by MCTS play with this many rollouts/move "
                         "instead of raw policy sampling (the reference's "
                         "strength story is search play, README.md:80-93)")
    ap.add_argument("--gens", help="comma-separated generation numbers to "
                                   "rate (default: all weights_*.json)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    gens = load_gen_weights(args.out_dir)
    if args.gens:
        want = {int(g) for g in args.gens.split(",")}
        gens = [g for g in gens if g[0] in want]
    if len(gens) < 2:
        print("need >= 2 generations", file=sys.stderr)
        return 1
    model_cfg = gens[0][2]
    if args.rollouts > 0:
        move_fn = build_search_move_fn(model_cfg, args.rollouts)
        _, territory_fn = build_move_fn(model_cfg)
    else:
        move_fn, territory_fn = build_move_fn(model_cfg)

    pairs = []
    for (i, (gi, *_)), (j, (gj, *_)) in itertools.combinations(
            enumerate(gens), 2):
        gap = j - i
        if gap <= args.max_pair_gap or (gap & (gap - 1)) == 0:
            pairs.append((i, j))

    lines = []
    for n, (i, j) in enumerate(pairs):
        gi, pa, _ = gens[i]
        gj, pb, _ = gens[j]
        res = play_pair(move_fn, territory_fn, pa, pb,
                        f"gen{gi:04d}", f"gen{gj:04d}", args.games,
                        args.seed + 7919 * n)
        lines.extend(res)
        wins_a = sum(1 for l in res
                     if (f"PB[gen{gi:04d}]" in l) == ("RE[B" in l))
        print(f"gen{gi:04d} vs gen{gj:04d}: {wins_a}/{len(res)}",
              file=sys.stderr, flush=True)

    if args.sgf_out:
        with open(args.sgf_out, "w") as fh:
            fh.write("\n".join(lines) + "\n")

    rating = fit_elo(lines)
    ordered = sorted(rating.items())
    print(json.dumps({"elo": {n: round(r, 1) for n, r in ordered},
                      "games": len(lines)}))
    deltas = [ordered[k + 1][1] - ordered[k][1]
              for k in range(len(ordered) - 1)]
    rising = sum(1 for d in deltas if d > 0)
    print(f"adjacent-generation Elo rises: {rising}/{len(deltas)}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
