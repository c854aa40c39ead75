#!/usr/bin/env python3
"""Measure greedy-vs-exact ladder agreement over random positions.

The exact reader explores the reference's full branch recursion
(`/root/reference/src/libdg_go/utils/ladder.rs:110-119`, as an
explicit-stack DFS); the greedy reader chases only the tight branch.
This script evaluates BOTH readers on every ladder candidate point (the
prefilter of `go/ladder.py::ladder_planes`) over either uniformly random
playouts (default; a dense torture distribution) or positions sampled
from real games (`--sgf CORPUS...`, the distribution the feature planes
actually see), and reports the per-point agreement rate:

    python tools/measure_ladder_greedy.py --points 50000
    python tools/measure_ladder_greedy.py \
        --sgf /root/reference/src/dg_tests/fixtures/example_games.sgf

Measured (2026-08-19): random playouts 96.0% (uniform-random boards are
full of degenerate two-liberty shapes where either branch works);
real-game positions are what `tests/test_ladder.py::test_greedy_agreement`
pins.
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from dream_go_tpu.go import engine, ladder  # noqa: E402
from dream_go_tpu.go.engine import EMPTY, OFFBOARD, GoState  # noqa: E402
from dream_go_tpu.go.topology import NBR, NN  # noqa: E402


def random_playout(states: GoState, steps: int, key) -> GoState:
    """Advance every board ``steps`` uniformly-random legal moves (no pass)."""

    def body(carry, _):
        st, k = carry
        k, sub = jax.random.split(k)
        mask = engine.legal_mask_batch(st)[:, :361]
        gumbel = jax.random.gumbel(sub, mask.shape)
        mv = jnp.argmax(jnp.where(mask, gumbel, -jnp.inf), axis=1)
        has = jnp.any(mask, axis=1)
        mv = jnp.where(has, mv, 361)  # pass when nothing is legal
        st = engine.step_batch(st, mv.astype(jnp.int32))
        return (st, k), None

    (states, _), _ = jax.lax.scan(body, (states, key), None, length=steps)
    return states


def candidate_masks(st: GoState):
    """(capture candidates, escape candidates) — same prefilter as
    `ladder_planes`."""
    stones, chain_id = st.stones, st.chain_id
    color = st.to_move
    opp = (OFFBOARD - color).astype(stones.dtype)
    _, chain_libs = engine.chain_liberties(stones, chain_id)
    pseudo = engine.pseudo_legal_mask(st, color)
    nbr_st = engine._pad(stones, jnp.int8(OFFBOARD))[NBR]
    nbr_cid = engine._pad(chain_id, -1)[NBR]
    nbr_libs = chain_libs[jnp.clip(nbr_cid, 0, NN)]
    cap = pseudo & jnp.any((nbr_st == opp) & (nbr_libs == 2), axis=1)
    esc = pseudo & jnp.any((nbr_st == color) & (nbr_libs == 1), axis=1)
    return cap, esc


def sgf_position_batches(paths, batch, per_game, seed):
    """Yield GoState batches sampled from real games (SGF corpus files).

    Real-game positions are the distribution the feature planes actually
    see; uniformly-random playouts (the default mode) are a much denser
    torture test full of degenerate two-liberty shapes.
    """
    from dream_go_tpu.selfplay.replay import states_at
    from dream_go_tpu.train.pipeline import parse_game

    games = []
    for path in paths:
        with open(path) as fh:
            games.extend(g for g in (parse_game(l) for l in fh if l.strip())
                         if g is not None and len(g.moves) >= 30)
    rng = np.random.default_rng(seed)
    samples = []  # (game_idx, position)
    for gi, g in enumerate(games):
        n = len(g.moves)
        for pos in rng.choice(n - 10, size=min(per_game, n - 10),
                              replace=False):
            samples.append((gi, 10 + int(pos)))  # skip the empty opening
    rng.shuffle(samples)
    t_max = max(len(g.moves) for g in games)
    t_max = ((t_max + 127) // 128) * 128
    replay = jax.jit(states_at, static_argnums=3)

    for start in range(0, len(samples) - batch + 1, batch):
        chunk = samples[start:start + batch]
        moves = np.full((batch, t_max), engine.PASS, np.int32)
        tgt = np.zeros(batch, np.int32)
        komi = np.zeros(batch, np.float32)
        for row, (gi, pos) in enumerate(chunk):
            seq = games[gi].moves
            moves[row, :len(seq)] = seq
            tgt[row] = pos
            komi[row] = games[gi].komi
        yield replay(jnp.asarray(moves), jnp.asarray(tgt),
                     jnp.asarray(komi), 64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=50000,
                    help="minimum candidate points to evaluate")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--depths", type=int, nargs="+",
                    default=[40, 80, 120, 160, 200])
    ap.add_argument("--sgf", nargs="+",
                    help="measure over positions sampled from these SGF "
                         "corpora instead of random playouts")
    ap.add_argument("--per-game", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    planes_exact = jax.jit(lambda s: ladder.ladder_planes_batch(
        s, chunk=args.chunk, max_candidates=32, greedy=False))
    planes_greedy = jax.jit(lambda s: ladder.ladder_planes_batch(
        s, chunk=args.chunk, max_candidates=32, greedy=True))
    cand_fn = jax.jit(jax.vmap(candidate_masks))
    step_jit = jax.jit(random_playout, static_argnums=1)

    total = agree = 0
    disagreements = []

    def tally(st, tag, where):
        nonlocal total, agree
        cap_c, esc_c = cand_fn(st)
        ce, ee = planes_exact(st)
        cg, eg = planes_greedy(st)
        cap_c, esc_c, ce, ee, cg, eg = map(
            np.asarray, (cap_c, esc_c, ce, ee, cg, eg))
        cand = cap_c | esc_c
        n = int(cand.sum())
        ok = int(((ce == cg) & (ee == eg) & cand).sum())
        total += n
        agree += ok
        if ok != n:
            bad = np.argwhere(((ce != cg) | (ee != eg)) & cand)
            disagreements.extend(
                (tag, where, int(b), int(p)) for b, p in bad[:8])
        print(f"{tag} {where}: {ok}/{n} agree "
              f"(cum {agree}/{total} = {agree / max(total, 1):.5f})",
              flush=True)

    if args.sgf:
        for i, st in enumerate(sgf_position_batches(
                args.sgf, args.batch, args.per_game, args.seed)):
            tally(st, "sgf-batch", i)
            if total >= args.points:
                break
    else:
        seed = args.seed
        while total < args.points:
            key = jax.random.PRNGKey(seed)
            st = engine.new_states(args.batch)
            depth = 0
            for d in args.depths:
                st = step_jit(st, d - depth, jax.random.fold_in(key, d))
                depth = d
                tally(st, seed, d)
            seed += 1

    rate = agree / total
    print(f"\nagreement: {agree}/{total} = {rate:.5%}")
    if disagreements:
        print("sample disagreements (seed, depth, board, point):")
        for d in disagreements[:20]:
            print(" ", d)
    print("PASS (>=99.9%)" if rate >= 0.999 else "FAIL (<99.9%)")


if __name__ == "__main__":
    main()
