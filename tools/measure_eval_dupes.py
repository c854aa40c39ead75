#!/usr/bin/env python3
"""Measure repeated leaf evaluations in the lockstep search.

The reference keeps a 200k-entry LRU cache in front of the net
(`src/libdg_mcts/lib.rs` full_forward cache) to dedupe transposition
evaluations.  Our claim (ARCHITECTURE.md) is that the batched array-MCTS
makes this unnecessary: each simulation expands a NEW tree node, so the
only repeats are transpositions reached through different move orders.
This tool counts them: it runs real searches and reports what fraction of
leaf evaluations hit a board hash that the SAME game already evaluated
earlier in the search (the only case the reference's cache would serve).

Usage: measure_eval_dupes.py [--games 64] [--sims 96] [--moves 12]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", type=int, default=64)
    ap.add_argument("--sims", type=int, default=96)
    ap.add_argument("--moves", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dream_go_tpu.config import ModelConfig, SearchConfig
    from dream_go_tpu.go import engine
    from dream_go_tpu.mcts import predictor as PR
    from dream_go_tpu.mcts import search as S
    from dream_go_tpu.models import tower as T

    cfg = SearchConfig(dirichlet_noise=0.25, fused=True)
    mcfg = ModelConfig(num_channels=16, num_blocks=2)
    params, stats = T.init_tower(mcfg, jax.random.PRNGKey(0))
    pred = PR.net_predictor(mcfg, params, stats)

    B = args.games
    states = engine.new_states(B)
    key = jax.random.PRNGKey(args.seed)
    step_j = jax.jit(jax.vmap(engine.step))
    legal_j = jax.jit(jax.vmap(engine.legal_mask))
    for i in range(args.moves):
        key, k = jax.random.split(key)
        mask = legal_j(states)
        mv = jax.vmap(lambda m, kk: jax.random.categorical(
            kk, jnp.where(m, 0.0, -jnp.inf)))(mask, jax.random.split(k, B))
        states = step_j(states, mv.astype(jnp.int32))

    trees = jax.jit(lambda st, r: S.init_trees(
        st, pred, r, cfg, args.sims + 1, None))(states, jax.random.PRNGKey(1))

    total = 0
    dupes = 0
    seen = [set() for _ in range(B)]
    tf = S._flatten_trees(trees)
    base = np.arange(B) * (args.sims + 1)
    run1 = jax.jit(lambda t: S.run_search(t, pred, cfg, 1, None))
    for s in range(args.sims):
        trees = run1(trees)
        # the newly inserted leaf of each game is at index size-1
        sizes = np.asarray(trees.size)
        for g in range(B):
            n = sizes[g] - 1
            h = (int(np.asarray(trees.states.hashw[g, n, 0])),
                 int(np.asarray(trees.states.hashw[g, n, 1])),
                 int(np.asarray(trees.states.meta[g, n, 0])))
            total += 1
            if h in seen[g]:
                dupes += 1
            seen[g].add(h)

    print(f"leaf evaluations: {total}; repeated board hashes "
          f"(would-be cache hits): {dupes} "
          f"({100.0 * dupes / max(total, 1):.2f}%)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
