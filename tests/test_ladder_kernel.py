"""Pallas exact-ladder kernel vs the XLA exact DFS (oracle-pinned).

`ops/ladder_kernel.py` re-implements the reference's branching ladder
recursion (`ladder.rs:53-178`) with VMEM-resident boards and incrementally
maintained chain-liberty rows; these tests pin it point-for-point to the
XLA exact reader of `go/ladder.py` (itself asserted equal to the recursive
oracle in test_ladder.py), on curated shapes and on random boards whose
chases exercise captures, counter-captures, merges, and the branch stack.
Runs in interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dream_go_tpu.go import engine, ladder
from dream_go_tpu.ops.env_step import pack_states
from dream_go_tpu.ops.ladder_kernel import ladder_planes_kernel
from dream_go_tpu.utils import coords


def board_with(black=(), white=(), to_move=1):
    s = engine.new_state()
    for name in black:
        p = coords.from_gtp(name)
        s = engine.step(s.replace(to_move=jnp.int8(1)), jnp.int32(p))
    for name in white:
        p = coords.from_gtp(name)
        s = engine.step(s.replace(to_move=jnp.int8(2)), jnp.int32(p))
    return s.replace(to_move=jnp.int8(to_move))


def kernel_planes(states):
    packed = pack_states(states)
    return ladder_planes_kernel(packed[0], packed[1],
                                states.to_move.astype(jnp.int32),
                                interpret=True)


def xla_exact(states):
    # unbounded candidates to match the kernel (which evaluates all)
    return jax.vmap(lambda s: ladder.ladder_planes(s, 361, False, 64))(
        states)


def assert_equal(states):
    cap_k, esc_k = map(np.asarray, kernel_planes(states))
    cap_r, esc_r = map(np.asarray, xla_exact(states))
    np.testing.assert_array_equal(cap_k, cap_r)
    np.testing.assert_array_equal(esc_k, esc_r)
    return int(cap_r.sum() + esc_r.sum())


def test_curated_shapes():
    cases = [
        dict(black=["C4", "D5", "E3"], white=["D4"]),      # textbook ladder
        dict(black=["A2", "B3"], white=["B2"]),            # counter-capture
        dict(black=["A2", "B3"], white=["B2", "D1"]),      # breaker
        dict(black=["B2"], white=["A2", "B3"]),            # escape shape
        dict(black=["A2", "B3", "C4", "D5", "E3"], white=["B2", "D4"]),
        dict(black=["C4", "D5", "E3"], white=["D4"], to_move=2),
    ]
    states = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[board_with(**c) for c in cases])
    fired = assert_equal(states)
    assert fired > 0


@pytest.mark.slow
@pytest.mark.parametrize("seed,depth", [(0, 60), (1, 90), (2, 120)])
def test_random_boards(seed, depth):
    def playout(states, steps, key):
        def body(carry, _):
            st, k = carry
            k, sub = jax.random.split(k)
            mask = engine.legal_mask_batch(st)[:, :361]
            g = jax.random.gumbel(sub, mask.shape)
            mv = jnp.argmax(jnp.where(mask, g, -jnp.inf), axis=1)
            mv = jnp.where(jnp.any(mask, axis=1), mv, 361)
            return (engine.step_batch(st, mv.astype(jnp.int32)), k), None
        return jax.lax.scan(body, (states, key), None, length=steps)[0][0]

    states = jax.jit(playout, static_argnums=1)(
        engine.new_states(4), depth, jax.random.PRNGKey(seed))
    assert_equal(states)
