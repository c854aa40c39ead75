#!/usr/bin/env python3
"""Isolate the fused-path per-phase costs on the chip.

Times, separately jitted: the leaf kernel on flat packed arrays (no tree),
the parent-state gather from packed tree states, insert+backup, and the
XLA-path equivalents, each with the axon timing protocol.

Usage: python tools/profile_leaf.py [--batch 1024] [--repeat 5] [--cpu]
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
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dream_go_tpu.config import SearchConfig
    from dream_go_tpu.go import engine
    from dream_go_tpu.mcts import search as S
    from dream_go_tpu.ops import env_step as ES
    from dream_go_tpu.ops.leaf_step import leaf_step

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    B, C = args.batch, args.capacity
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

    def fetch(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1].sum()

    out = {}

    def timeit(name, fn, fetch_of):
        f0 = fn()          # warmup: program load through the tunnel
        fetch(fetch_of(f0))
        ts = []
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            o = fn()
            fetch(fetch_of(o))
            ts.append(time.perf_counter() - t0)
        out[name] = round(1e3 * float(np.median(ts)), 3)
        print(f"{name}: {out[name]} ms", file=sys.stderr)

    # flat packed state (no tree): kernel cost in isolation
    packed = jax.jit(ES.pack_states)(states)
    packed = jax.tree_util.tree_map(lambda x: x.copy(), packed)
    fetch(packed[0])
    actions = jnp.full((B,), 72, jnp.int32)
    komi = states.komi

    kern = jax.jit(lambda p, a, k: leaf_step(*p, a, k))
    timeit("leaf_kernel_flat", lambda: kern(packed, actions, komi),
           lambda o: o[1])

    # tree-resident variant: gather parent rows then kernel
    cfg = SearchConfig(fused=True)
    prior = jnp.full((B, 362), 1.0 / 362, jnp.float32)
    cand = jnp.ones((B, 362), bool)
    value = jnp.full((B,), 0.5, jnp.float32)
    rngs = jax.random.split(jax.random.PRNGKey(2), B)
    trees = jax.jit(lambda st, v, p, c, r: jax.vmap(
        lambda s_, v_, p_, c_, r_: S.init_tree(s_, v_, p_, c_, r_, cfg, C)
    )(st, v, p, c, r))(S.pack_rows(states), value, prior, cand, rngs)
    fetch(trees.node_n)
    node = jnp.zeros((B,), jnp.int32)

    def gather(t, n):
        return jax.vmap(
            lambda st, nn: jax.tree_util.tree_map(lambda b: b[nn], st)
        )(t.states, n)

    gat = jax.jit(gather)
    timeit("gather", lambda: gat(trees, node), lambda o: o.stones)

    parent = gat(trees, node)
    kern2 = jax.jit(
        lambda p, a, k: leaf_step(*S._widen_rows(p), a, k))
    timeit("leaf_kernel_from_rows", lambda: kern2(parent, actions, komi),
           lambda o: o[1])

    gk = jax.jit(lambda t, n, a, k: leaf_step(
        *S._widen_rows(gather(t, n)), a, k))
    timeit("gather_plus_kernel", lambda: gk(trees, node, actions, komi),
           lambda o: o[1])

    # insert+backup alone on the packed tree
    leafp, feats_k, candk = gk(trees, node, actions, komi)
    leaf_states = S._narrow_rows(leafp, komi)
    policy = jnp.full((B, 362), 1.0 / 362, jnp.float32)
    candf = jnp.concatenate([candk, jnp.ones((B, 1), bool)], axis=1)
    C = trees.node_n.shape[1]
    d = min(C, S.MAX_BACKUP_DEPTH)
    path_n = jnp.full((B, d), -1, jnp.int32).at[:, 0].set(0)
    path_k = jnp.full((B, d), -1, jnp.int32)
    k_exit = jnp.full((B,), -1, jnp.int32)
    ins = jax.jit(lambda t, n, a, s, v, p, c: S._insert_backup_flat(
        S._flatten_trees(t), n, a, k_exit, path_n, path_k, a, s, v, p,
        None, None, c, B, C))
    timeit("insert_backup",
           lambda: ins(trees, node, actions, leaf_states, value, policy,
                       candf),
           lambda o: o.node_n)

    # select alone
    sel = jax.jit(lambda t: S._select_flat(S._flatten_trees(t), cfg, B, C))
    timeit("select", lambda: sel(trees), lambda o: o[0])

    out["batch"] = B
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
