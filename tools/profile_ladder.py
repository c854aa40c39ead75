#!/usr/bin/env python3
"""Cost of the ladder feature planes on the active backend.

Times `ladder_planes_batch` (greedy and exact DFS) at self-play batch
sizes, plus the full fused-search sims/s with ladders off / greedy /
exact, so the default disposition of `SearchConfig.ladders_exact` is a
measured decision, not a guess.

Usage: profile_ladder.py [--batch 1024] [--chunk 128] [--repeats 5]
                         [--skip-search] [--cpu]
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, repeats):
    import numpy as np
    out = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        r = fn()
        # force a real device->host fetch (block_until_ready returns early
        # through the axon tunnel)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        out.append(time.perf_counter() - t0)
    return statistics.median(out)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--depth", type=int, default=100)
    ap.add_argument("--skip-search", action="store_true")
    ap.add_argument("--modes", nargs="+", default=["greedy", "exact"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    global jax
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    elif jax.default_backend() != "cpu":
        cache = os.environ.get(
            "DG_COMPILE_CACHE",
            f"/tmp/dream_go_tpu_jax_cache_{jax.default_backend()}")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import numpy as np

    from dream_go_tpu.go import engine
    from dream_go_tpu.go.ladder import ladder_planes_batch

    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    # realistic mid-game positions: policy-free random playout to depth
    key = jax.random.PRNGKey(0)
    states = engine.new_states(args.batch)

    def playout(st, k):
        def body(carry, _):
            s, kk = carry
            kk, sub = jax.random.split(kk)
            mask = engine.legal_mask_batch(s)[:, :361]
            g = jax.random.gumbel(sub, mask.shape)
            mv = jnp.argmax(jnp.where(mask, g, -jnp.inf), axis=1)
            mv = jnp.where(jnp.any(mask, axis=1), mv, 361)
            return (engine.step_batch(s, mv.astype(jnp.int32)), kk), None
        return jax.lax.scan(body, (st, k), None, length=args.depth)[0][0]

    states = jax.jit(playout)(states, key)
    np.asarray(states.stones)

    for mode in args.modes:
        if mode == "kernel":
            from dream_go_tpu.ops.env_step import pack_states
            from dream_go_tpu.ops.ladder_kernel import ladder_planes_kernel

            def fn(s):
                packed = pack_states(s)
                return ladder_planes_kernel(
                    packed[0], packed[1], s.to_move.astype(jnp.int32))
            fn = jax.jit(fn)
        else:
            greedy = mode == "greedy"
            fn = jax.jit(lambda s, g=greedy: ladder_planes_batch(
                s, chunk=args.chunk, greedy=g))
        t0 = time.perf_counter()
        cap, esc = fn(states)
        np.asarray(cap)
        compile_s = time.perf_counter() - t0
        med = timed(lambda: fn(states), args.repeats)
        print(f"ladder_planes[{mode}] batch {args.batch} chunk "
              f"{args.chunk}: {med * 1e3:.1f} ms/batch "
              f"({med / args.batch * 1e6:.1f} us/board; compile+first "
              f"{compile_s:.1f}s)", flush=True)

    if args.skip_search:
        return 0

    from dream_go_tpu.config import ModelConfig, SearchConfig
    from dream_go_tpu.mcts.predictor import net_predictor
    from dream_go_tpu.mcts.search import search
    from dream_go_tpu.models import tower as T

    mcfg = ModelConfig()  # flagship 9x128
    params, stats = T.init_tower(mcfg, jax.random.PRNGKey(0))
    predictor = net_predictor(mcfg, params, stats)
    on_tpu = jax.default_backend() == "tpu"
    sims = 16

    for label, kw in [
            ("off", dict(ladder_features=False)),
            ("greedy", dict(ladder_features=True, ladders_exact=False)),
            ("exact", dict(ladder_features=True, ladders_exact=True))]:
        if label.replace("off", "greedy") not in args.modes \
                and label != "off":
            continue
        cfg = SearchConfig(num_rollout=sims, fused=on_tpu,
                           feature_kernel=not on_tpu, **kw)
        fn = jax.jit(lambda s, r: search(
            s, predictor, r, cfg, sims, capacity=sims + 8))
        t0 = time.perf_counter()
        trees = fn(states, jax.random.PRNGKey(1))
        np.asarray(trees.node_n[:1, :1])
        compile_s = time.perf_counter() - t0
        med = timed(lambda: fn(states, jax.random.PRNGKey(2)), args.repeats)
        rate = sims * args.batch / med
        print(f"search[ladders={label}] batch {args.batch} x {sims} sims: "
              f"{rate:,.0f} sims/s (compile+first {compile_s:.1f}s)",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
