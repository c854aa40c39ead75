#!/usr/bin/env python3
"""Disambiguate standalone-vs-in-loop leaf_step cost on the chip.

Times: (a) one kernel call fetching the smallest output, (b) 8 chained
kernel calls in one jit, (c) 8 chained calls under lax.fori_loop.  If (b)/8
and (c)/8 are far below (a), the standalone number is dispatch artifact.
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dream_go_tpu.go import engine
    from dream_go_tpu.ops import env_step as ES
    from dream_go_tpu.ops.leaf_step import leaf_step

    B = 1024
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
    packed = jax.jit(ES.pack_states)(states)
    actions = jnp.full((B,), 72, jnp.int32)
    komi = states.komi

    def fetch(x):
        return np.asarray(x).ravel()[:1].sum()

    def timeit(name, fn, n=5):
        o = fn()
        fetch(o)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            o = fn()
            fetch(o)
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {1e3 * float(np.median(ts)):.1f} ms", flush=True)

    one = jax.jit(lambda p, a, k: leaf_step(*p, a, k)[2])
    timeit("single_call_small_fetch", lambda: one(packed, actions, komi))

    def chain(p, a, k):
        for _ in range(8):
            p2, feats, cand = leaf_step(*p, a, k)
            p = p2
        return cand

    chain_j = jax.jit(chain)
    timeit("chain8", lambda: chain_j(packed, actions, komi))

    def loop(p, a, k):
        def body(i, carry):
            p2, feats, cand = leaf_step(*carry, a, k)
            return p2
        return jax.lax.fori_loop(0, 8, body, p)[0]

    loop_j = jax.jit(loop)
    timeit("fori8", lambda: loop_j(packed, actions, komi))
    return 0


if __name__ == "__main__":
    sys.exit(main())
