#!/usr/bin/env python3
"""Ablation profile of the fused simulation step, all in-loop.

Each variant runs 8 simulations inside one jitted fori_loop (amortizing the
~30ms tunnel round-trip), so differences between variants are real device
time:

  full        select + gather + kernel + net + insert  (the product path)
  no_insert   select + gather + kernel + net
  no_select   gather + kernel + net + insert (fixed node/action)
  kernel_net  gather + kernel + net (fixed node/action)
  xla_full    the cfg.fused=False product path (feature_kernel=True)

Usage: python tools/profile_sim_phases.py [--batch 1024] [--channels 128]
       [--blocks 9] [--cpu]
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
    from dream_go_tpu.go import engine, features
    from dream_go_tpu.mcts import predictor as PR
    from dream_go_tpu.mcts import search as S
    from dream_go_tpu.models import tower as T
    from dream_go_tpu.ops.leaf_step import leaf_step

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

    def kernel_part(tf, node, action):
        parent = gather_parent(tf, node)
        leaf_packed, feats_k, cand = leaf_step(
            *S._widen_rows(parent), action, parent.komi)
        leaf_states = S._narrow_rows(leaf_packed, parent.komi)
        b = cand.shape[0]
        feats = feats_k[:, :, :361].transpose(0, 2, 1).reshape(b, 19, 19, 32)
        candidate = jnp.concatenate([cand, jnp.ones((b, 1), bool)], axis=1)
        return leaf_states, feats, candidate

    base = jnp.arange(B, dtype=jnp.int32) * C

    def gather_parent(tf, node):
        return jax.tree_util.tree_map(lambda x: x[base + node], tf.states)

    def full_step(i, tf):
        node, action, k_exit, path_n, path_k, root_a = S._select_flat(
            tf, cfg, B, C)
        leaf_states, feats, candidate = kernel_part(tf, node, action)
        value, policy = pred(feats)
        return S._insert_backup_flat(
            tf, node, action, k_exit, path_n, path_k, root_a, leaf_states,
            value, policy, None, None, candidate, B, C)

    def no_insert_step(i, carry):
        tf, acc = carry
        node, action, *_ = S._select_flat(tf, cfg, B, C)
        leaf_states, feats, candidate = kernel_part(tf, node, action)
        value, policy = pred(feats)
        acc = acc + jnp.sum(value) + jnp.sum(node.astype(jnp.float32))
        return tf, acc

    def fixed_na(i):
        node = jnp.zeros((B,), jnp.int32)
        action = jnp.full((B,), (17 * i) % 361, jnp.int32)
        d = min(C, S.MAX_BACKUP_DEPTH)
        path_n = jnp.full((B, d), -1, jnp.int32).at[:, 0].set(0)
        path_k = jnp.full((B, d), -1, jnp.int32)
        k_exit = jnp.full((B,), -1, jnp.int32)
        return node, action, k_exit, path_n, path_k, action

    def no_select_step(i, tf):
        node, action, k_exit, path_n, path_k, root_a = fixed_na(i)
        leaf_states, feats, candidate = kernel_part(tf, node, action)
        value, policy = pred(feats)
        return S._insert_backup_flat(
            tf, node, action, k_exit, path_n, path_k, root_a, leaf_states,
            value, policy, None, None, candidate, B, C)

    def kernel_net_step(i, carry):
        tf, acc = carry
        node, action, *_ = fixed_na(i)
        leaf_states, feats, candidate = kernel_part(tf, node, action)
        value, policy = pred(feats)
        return tf, acc + jnp.sum(value)

    full_j = jax.jit(lambda t: jax.lax.fori_loop(
        0, SIMS, full_step, S._flatten_trees(t)))
    no_ins_j = jax.jit(lambda t: jax.lax.fori_loop(
        0, SIMS, no_insert_step, (S._flatten_trees(t), jnp.float32(0.0)))[1])
    no_sel_j = jax.jit(lambda t: jax.lax.fori_loop(
        0, SIMS, no_select_step, S._flatten_trees(t)))
    kn_j = jax.jit(lambda t: jax.lax.fori_loop(
        0, SIMS, kernel_net_step, (S._flatten_trees(t), jnp.float32(0.0)))[1])
    timeit("full", lambda: full_j(trees))
    timeit("no_insert", lambda: no_ins_j(trees))
    timeit("no_select", lambda: no_sel_j(trees))
    timeit("kernel_net", lambda: kn_j(trees))

    # XLA product path at the same net for comparison
    cfg_x = SearchConfig(feature_kernel=True)
    trees_x = jax.jit(
        lambda st, r: S.init_trees(st, pred, r, cfg_x, C, None)
    )(states, jax.random.PRNGKey(2))
    trees_x = jax.jit(
        lambda t: S.run_search(t, pred, cfg_x, 24, None))(trees_x)
    fetch(trees_x.node_n)
    full_x = jax.jit(lambda t: S.run_search(t, pred, cfg_x, SIMS, None))
    timeit("xla_full", lambda: full_x(trees_x))

    out["batch"] = B
    out["net"] = f"{args.blocks}x{args.channels}"
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
