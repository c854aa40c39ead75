#!/usr/bin/env python3
"""Measure the in-loop cost of ladder planes 30/31 in the fused search.

The round-3 verdict's top item: the default input contract ships without
ladder planes, justified only by the *XLA* exact reader's cost (~11 s per
1024-board batch).  The Pallas kernel (`ops/ladder_kernel.py`) was built to
make the planes affordable in the hot loop but its cost there was never
published.  This measures the flagship fused search (9x128 net, batch 1024,
the `bench.py --full` mcts protocol) in three configurations:

  off     ladder_features=False                  (round-0..3 default)
  kernel  ladder_features=True  on TPU           (exact Pallas reader)
  greedy  ladder_features=True, ladders_exact=False on CPU path only

and prints sims/s + relative overhead.  The decision rule from VERDICT.md:
overhead <= ~20% => flip the default ON (reference parity,
`/root/reference/src/libdg_go/utils/features.rs:101-148` computes the
planes for every evaluated position unconditionally).

Usage: measure_ladder_cost.py [--batch 1024] [--sims 16] [--reps 5] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(scfg, mb, sims, reps, pred, label):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dream_go_tpu.go import engine
    from dream_go_tpu.mcts import search as S

    mstates = engine.new_states(mb)
    trees = jax.jit(lambda st, r: S.init_trees(
        st, pred, r, scfg, sims * (reps + 2) + 1, None))(
        mstates, jax.random.PRNGKey(0))
    run = jax.jit(lambda t: S.run_search(t, pred, scfg, sims, None))
    t0 = time.time()
    trees = run(trees)
    int(np.asarray(jnp.sum(trees.node_n)))
    print(f"  [{label}] compile+first: {time.time() - t0:.1f}s",
          file=sys.stderr)
    times = []
    for _ in range(reps):
        t0 = time.time()
        trees = run(trees)
        int(np.asarray(jnp.sum(trees.node_n)))
        times.append(time.time() - t0)
    sps = mb * sims / float(np.median(times))
    print(f"  [{label}] sims/s: {sps:,.0f} (median of {reps}x{sims} sims, "
          f"batch {mb})", file=sys.stderr)
    return sps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--sims", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        # persistent compile cache (cli.py semantics): repeat measurements
        # skip the remote compile service
        cache = os.environ.get("DG_COMPILE_CACHE",
                               "/tmp/dream_go_tpu_jax_cache_tpu")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from dream_go_tpu.config import ModelConfig, SearchConfig
    from dream_go_tpu.mcts.predictor import net_predictor
    from dream_go_tpu.models import tower as T

    on_tpu = jax.default_backend() == "tpu"
    mb = args.batch if on_tpu else 8
    sims = args.sims if on_tpu else 4
    reps = args.reps if on_tpu else 2

    mcfg = ModelConfig()
    mp, mstats = T.init_tower(mcfg, jax.random.PRNGKey(0))
    pred = net_predictor(mcfg, mp, mstats)

    base = SearchConfig(fused=on_tpu, feature_kernel=not on_tpu,
                        adaptive=False)
    results = {}
    results["off"] = measure(base, mb, sims, reps, pred, "off")
    import dataclasses
    on_cfg = dataclasses.replace(base, ladder_features=True,
                                 ladders_exact=True)
    results["kernel" if on_tpu else "xla_exact"] = measure(
        on_cfg, mb, sims, reps, pred, "kernel" if on_tpu else "xla_exact")
    on = results.get("kernel", results.get("xla_exact"))
    overhead = results["off"] / on - 1.0
    print(json.dumps({
        "batch": mb, "sims_per_call": sims,
        "sims_per_sec_off": round(results["off"], 1),
        "sims_per_sec_ladders": round(on, 1),
        "overhead_pct": round(100 * overhead, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
