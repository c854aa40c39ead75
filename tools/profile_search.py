#!/usr/bin/env python3
"""Per-phase wall-clock profile of one MCTS simulation step on the chip.

Times select / env-step / features / net / insert+backup separately at a
given batch size and net, following the axon timing protocol (warmup call +
real device->host fetch, then timed calls + fetch).

Usage: python tools/profile_search.py [--batch 1024] [--sims 16]
       [--channels 128] [--blocks 9] [--repeat 5] [--cpu]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--capacity", type=int, default=257)
    ap.add_argument("--warm-sims", type=int, default=24,
                    help="simulations run before timing (tree fill)")
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--blocks", type=int, default=9)
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--feature-kernel", action="store_true", default=True)
    ap.add_argument("--step-kernel", action="store_true")
    ap.add_argument("--fused", action="store_true",
                    help="profile the fused leaf-kernel driver instead")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dream_go_tpu.config import ModelConfig, SearchConfig
    from dream_go_tpu.go import engine, features
    from dream_go_tpu.mcts import predictor as PR
    from dream_go_tpu.mcts import search as S
    from dream_go_tpu.models import tower as T

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    cfg = SearchConfig(feature_kernel=args.feature_kernel,
                       step_kernel=args.step_kernel, fused=args.fused)
    mcfg = ModelConfig(num_channels=args.channels, num_blocks=args.blocks)
    params, stats = T.init_tower(mcfg, jax.random.PRNGKey(0))
    pred = PR.net_predictor(mcfg, params, stats)

    B, C = args.batch, args.capacity
    states = engine.new_states(B)
    # randomize the openings so trees have structure
    key = jax.random.PRNGKey(1)
    step_j = jax.jit(jax.vmap(engine.step))
    legal_j = jax.jit(jax.vmap(engine.legal_mask))
    for i in range(12):
        key, k = jax.random.split(key)
        mask = legal_j(states)
        mv = jax.vmap(lambda m, kk: jax.random.categorical(
            kk, jnp.where(m, 0.0, -jnp.inf)))(mask, jax.random.split(k, B))
        states = step_j(states, mv.astype(jnp.int32))

    trees = jax.jit(
        lambda st, r: S.init_trees(st, pred, r, cfg, C, None)
    )(states, jax.random.PRNGKey(2))
    trees = jax.jit(
        lambda t: S.run_search(t, pred, cfg, args.warm_sims, None)
    )(trees)

    def fetch(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]

    fetch(trees.node_n)

    def timeit(fn, fetch_of, n=None):
        n = n or args.repeat
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            fetch(fetch_of(out))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    if args.fused:
        from dream_go_tpu.ops.leaf_step import leaf_step

        C = trees.node_n.shape[1]
        sel = jax.jit(lambda t: S._select_flat(
            S._flatten_trees(t), cfg, args.batch, C)[:2])
        node, action = sel(trees)
        fetch(node)

        def kern(trees, node, action):
            tf = S._flatten_trees(trees)
            base = jnp.arange(args.batch, dtype=jnp.int32) * C
            parent = jax.tree_util.tree_map(
                lambda b: b[base + node], tf.states)
            leaf_packed, feats_k, cand = leaf_step(
                *S._widen_rows(parent), action, parent.komi)
            b = cand.shape[0]
            feats = feats_k[:, :, :361].transpose(0, 2, 1) \
                .reshape(b, 19, 19, 32)
            return feats, cand

        kern_j = jax.jit(kern)
        feats, cand = kern_j(trees, node, action)
        fetch(feats)
        net = jax.jit(lambda f: pred(f))
        value, policy = net(feats)
        fetch(value)
        full = jax.jit(lambda t: S.run_search(t, pred, cfg, 8, None))
        t3 = full(trees)
        fetch(t3.node_n)

        out = {}
        out["select_ms"] = 1e3 * timeit(lambda: sel(trees), lambda o: o[0])
        out["leaf_kernel_ms"] = 1e3 * timeit(
            lambda: kern_j(trees, node, action), lambda o: o[0])
        out["net_ms"] = 1e3 * timeit(lambda: net(feats), lambda o: o[0])
        out["full_sim_ms"] = 1e3 * timeit(lambda: full(trees),
                                          lambda o: o.node_n) / 8.0
        out["insert_est_ms"] = (out["full_sim_ms"] - out["select_ms"]
                                - out["leaf_kernel_ms"] - out["net_ms"])
        out["sims_per_s"] = args.batch / (out["full_sim_ms"] / 1e3)
        out["batch"] = args.batch
        out["capacity"] = args.capacity
        out["net"] = f"{args.blocks}x{args.channels}"
        out["fused"] = True
        print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                          for k, v in out.items()}))
        return 0

    # --- phase functions, each jitted standalone --------------------------
    C = trees.node_n.shape[1]
    baseg = jnp.arange(args.batch, dtype=jnp.int32) * C

    def _sel(t):
        tf = S._flatten_trees(t)
        node, action, *_ = S._select_flat(tf, cfg, args.batch, C)
        parents = jax.tree_util.tree_map(lambda b: b[baseg + node],
                                         tf.states)
        return node, action, parents

    sel = jax.jit(_sel)
    sel_step = jax.jit(lambda t: (lambda n, a, p: (n, a, jax.vmap(
        engine.step)(p, a)))(*_sel(t)))

    node, action, parents = sel(trees)
    _, _, leaves = sel_step(trees)
    fetch(leaves.stones)

    feat = jax.jit(lambda s: features.extract_batch(
        s, cfg.feature_set, cfg.ladder_features, cfg.feature_kernel))
    feats = feat(leaves)
    fetch(feats)

    net = jax.jit(lambda f: pred(f))
    value, policy = net(feats)
    fetch(value)

    d = min(C, S.MAX_BACKUP_DEPTH)
    pn0 = jnp.full((args.batch, d), -1, jnp.int32).at[:, 0].set(0)
    pk0 = jnp.full((args.batch, d), -1, jnp.int32)
    ke0 = jnp.full((args.batch,), -1, jnp.int32)
    ins = jax.jit(lambda t, n, a, s, v, p: S._insert_backup_flat(
        S._flatten_trees(t), n, a, ke0, pn0, pk0, a, s, v, p, None, None,
        None, args.batch, C))
    t2 = ins(trees, node, action, leaves, value, policy)
    fetch(t2.node_n)

    full = jax.jit(lambda t: S.run_search(t, pred, cfg, 8, None))
    t3 = full(trees)
    fetch(t3.node_n)

    out = {}
    out["select_ms"] = 1e3 * timeit(lambda: sel(trees),
                                    lambda o: o[0])
    out["select_step_ms"] = 1e3 * timeit(lambda: sel_step(trees),
                                         lambda o: o[2].stones)
    out["step_ms"] = out["select_step_ms"] - out["select_ms"]
    out["features_ms"] = 1e3 * timeit(lambda: feat(leaves), lambda o: o)
    out["net_ms"] = 1e3 * timeit(lambda: net(feats), lambda o: o[0])
    out["insert_backup_ms"] = 1e3 * timeit(
        lambda: ins(trees, node, action, leaves, value, policy),
        lambda o: o.node_n)
    out["full_sim_ms"] = 1e3 * timeit(lambda: full(trees),
                                      lambda o: o.node_n) / 8.0
    out["sum_phases_ms"] = (out["select_step_ms"] + out["features_ms"]
                            + out["net_ms"] + out["insert_backup_ms"])
    out["sims_per_s"] = args.batch / (out["full_sim_ms"] / 1e3)
    out["batch"] = args.batch
    out["capacity"] = args.capacity
    out["net"] = f"{args.blocks}x{args.channels}"
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in out.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
