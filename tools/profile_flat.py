#!/usr/bin/env python3
"""In-loop ablation of the FLAT simulation step (the product path).

  fused_full   run_search with cfg.fused (select+gather+kernel+net+insert)
  sel_only     _select_flat alone in the loop
  ins_only     _insert_backup_flat alone (fixed node/action, fake value)
  gather_only  parent-row gather alone

Usage: python tools/profile_flat.py [--batch 1024] [--cpu]
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
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--blocks", type=int, default=9)
    ap.add_argument("--sims", type=int, default=8)
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dream_go_tpu.config import ModelConfig, SearchConfig
    from dream_go_tpu.go import engine
    from dream_go_tpu.mcts import predictor as PR
    from dream_go_tpu.mcts import search as S
    from dream_go_tpu.models import tower as T

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    cfg = SearchConfig(fused=True)
    mcfg = ModelConfig(num_channels=args.channels, num_blocks=args.blocks)
    params, stats = T.init_tower(mcfg, jax.random.PRNGKey(0))
    pred = PR.net_predictor(mcfg, params, stats)

    B, C, SIMS = args.batch, args.capacity, args.sims
    states = engine.new_states(B)
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
        lambda t: S.run_search(t, pred, cfg, 24, None))(trees)

    def fetch(x):
        return float(np.asarray(jnp.sum(
            jax.tree_util.tree_leaves(x)[0].astype(jnp.float32))))

    fetch(trees.node_n)
    out = {}

    def timeit(name, fn):
        o = fn()
        fetch(o)
        ts = []
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            o = fn()
            fetch(o)
            ts.append(time.perf_counter() - t0)
        out[name] = round(1e3 * float(np.median(ts)) / SIMS, 2)
        print(f"{name}: {out[name]} ms/sim", file=sys.stderr, flush=True)

    full_j = jax.jit(lambda t: S.run_search(t, pred, cfg, SIMS, None))
    timeit("fused_full", lambda: full_j(trees))

    fake = PR.random_predictor()
    nonet_j = jax.jit(lambda t: S.run_search(t, fake, cfg, SIMS, None))
    timeit("full_fake_net", lambda: nonet_j(trees))

    from dream_go_tpu.ops.leaf_step import leaf_step

    def noins_loop(t):
        tf = S._flatten_trees(t)
        base = jnp.arange(B, dtype=jnp.int32) * C

        def body(i, carry):
            tf, acc = carry
            node, action, path_n, path_a = S._select_flat(tf, cfg, B, C)
            parent = jax.tree_util.tree_map(lambda x: x[base + node],
                                            tf.states)
            leaf_packed, feats_k, cand = leaf_step(
                *S._widen_rows(parent), action, parent.komi)
            feats = feats_k[:, :, :361].transpose(0, 2, 1) \
                .reshape(B, 19, 19, 32)
            value, policy = pred(feats)
            acc = acc + jnp.sum(value) + jnp.sum(path_n[:, 1]) \
                + jnp.sum(cand) + (i - i)
            return tf, acc

        return jax.lax.fori_loop(0, SIMS, body, (tf, jnp.float32(0.0)))[1]

    noins_j = jax.jit(noins_loop)
    timeit("no_insert_ctx", lambda: noins_j(trees))

    base = jnp.arange(B, dtype=jnp.int32) * C

    def sel_loop(t):
        tf = S._flatten_trees(t)

        def body(i, acc):
            node, action, path_n, path_a = S._select_flat(tf, cfg, B, C)
            return acc + jnp.sum(node + i) + jnp.sum(action) \
                + jnp.sum(path_n[:, 1])

        return jax.lax.fori_loop(0, SIMS, body, jnp.int32(0))

    sel_j = jax.jit(sel_loop)
    timeit("sel_only", lambda: sel_j(trees))

    leaf_rows = jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[2:])[base + 1], trees.states)
    value = jnp.full((B,), 0.4, jnp.float32)
    policy = jnp.full((B, 362), 1.0 / 362, jnp.float32)
    cand = jnp.ones((B, 362), bool)

    def ins_loop(t):
        tf = S._flatten_trees(t)

        def body(i, tf):
            node = jnp.zeros((B,), jnp.int32)
            action = jnp.full((B,), 1, jnp.int32) + i
            path_n = jnp.full((B, C), -1, jnp.int32).at[:, 0].set(0)
            path_a = jnp.zeros((B, C), jnp.int32).at[:, 0].set(action)
            return S._insert_backup_flat(tf, node, action, path_n, path_a,
                                         leaf_rows, value, policy, None,
                                         None, cand, B, C)

        return jax.lax.fori_loop(0, SIMS, body, tf).node_n

    ins_j = jax.jit(ins_loop)
    timeit("ins_only", lambda: ins_j(trees))

    def gat_loop(t):
        tf = S._flatten_trees(t)

        def body(i, acc):
            rows = jax.tree_util.tree_map(
                lambda x: x[base + (i % C)], tf.states)
            return acc + jnp.sum(rows.meta[:, 0])

        return jax.lax.fori_loop(0, SIMS, body, jnp.int32(0))

    gat_j = jax.jit(gat_loop)
    timeit("gather_only", lambda: gat_j(trees))

    out["batch"] = B
    out["net"] = f"{args.blocks}x{args.channels}"
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
