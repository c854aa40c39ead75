"""Adversarial ladder boards: pin behavior at and beyond the DFS bounds.

The exact readers (XLA explicit-stack DFS `go/ladder.py`, Pallas kernel
`ops/ladder_kernel.py`) bound the chase with ``BUDGET`` total rungs and a
``STACK_CAP``-deep branch stack, while the reference recursion is unbounded
(`/root/reference/src/libdg_go/utils/ladder.rs:53-119`, no depth limit) and
the in-repo oracle caps recursion at `reference.LADDER_MAX_DEPTH` = 80.
These tests drive the deepest chases constructible on 19x19 — a
corner-to-corner staircase (depth 31, about twice as deep as any curated
test position) and deep broken ladders that force full branch exploration —
against an UNCAPPED oracle, then shrink the bounds to pin the overflow
semantics (overflow resolves to "no capture") and measure the slack.

Measured bounds (asserted below): the staircase's winning line is 31 rungs
deep; the whole DFS — fail-fast alternates included — resolves within a
62-rung budget, 5x below ``BUDGET`` = 320; the deepest broken ladder
explores 57 oracle calls.  A 19x19 chase cannot exceed ~120 rungs deep
(every rung consumes one attacker and one defender stone), so BUDGET = 320
covers every physically constructible board.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dream_go_tpu.go import engine, ladder
from dream_go_tpu.go import reference as R

N = 19
BLACK, WHITE = 1, 2


def pt(r, c):
    return r * N + c


def make_state(stones, to_move=BLACK):
    """GoState from a raw 361 stones list (int 0/1/2)."""
    s = engine.new_state()
    arr = np.asarray(stones, np.int8)
    # chain ids: min point index per 4-connected same-color group (engine
    # convention), via flood fill
    cid = np.arange(engine.NN, dtype=np.int32)
    seen = np.zeros(engine.NN, bool)
    for p in range(engine.NN):
        if arr[p] == 0 or seen[p]:
            continue
        group, stack = [], [p]
        seen[p] = True
        while stack:
            q = stack.pop()
            group.append(q)
            r, c = divmod(q, N)
            for nb in ([q - N] if r > 0 else []) + ([q - 1] if c > 0 else []) \
                    + ([q + 1] if c < N - 1 else []) \
                    + ([q + N] if r < N - 1 else []):
                if arr[nb] == arr[p] and not seen[nb]:
                    seen[nb] = True
                    stack.append(nb)
        cid[group] = min(group)
    return s.replace(stones=jnp.asarray(arr),
                     chain_id=jnp.asarray(cid),
                     to_move=jnp.int8(to_move))


def staircase_board(breakers=()):
    """White seed at (2,2) covered so the ladder staircases SE to the edge.

    Black attacks at (3,2); the winning line zigzags to (18,17)/(17,18),
    31 extensions deep.  ``breakers`` adds white stones.
    """
    stones = [0] * (N * N)
    stones[pt(2, 2)] = WHITE
    stones[pt(1, 2)] = BLACK
    stones[pt(2, 1)] = BLACK
    stones[pt(1, 3)] = BLACK   # diagonal cover for the first E extension
    for br in breakers:
        stones[pt(*br)] = WHITE
    return stones


def oracle_capture(stones, p, max_depth):
    b = R.PyBoard()
    b.stones = list(stones)
    return b.is_ladder_capture(BLACK, p, max_depth=max_depth)


def oracle_depth(stones, p):
    """(captured, deepest recursion level, total recursion calls)."""
    seen = {"depth": 0, "calls": 0}
    orig = R._l_capture

    def wrapped(st, color, q, depth=0, max_depth=None):
        seen["depth"] = max(seen["depth"], depth)
        seen["calls"] += 1
        return orig(st, color, q, depth, max_depth)

    R._l_capture = wrapped
    try:
        got = oracle_capture(stones, p, max_depth=10**6)
    finally:
        R._l_capture = orig
    return got, seen["depth"], seen["calls"]


def xla_capture(state, p, budget=None, stack_cap=None):
    return bool(ladder.is_ladder_capture(
        state.stones, state.chain_id, BLACK, jnp.int32(p),
        budget=budget, stack_cap=stack_cap))


class TestCornerToCornerStaircase:
    """A whole-board chase, ~2x deeper than any curated ladder position."""

    def test_oracle_depth_and_budget_slack(self):
        stones = staircase_board()
        got, depth, calls = oracle_depth(stones, pt(3, 2))
        assert got is True
        assert depth == 31              # corner-to-corner winning line
        assert calls == 48              # alternates all die fail-fast
        # the default oracle cap (80) already covers it; so does BUDGET
        assert depth < R.LADDER_MAX_DEPTH < ladder.BUDGET

    def test_all_readers_agree_on_the_deep_chase(self):
        stones = staircase_board()
        s = make_state(stones)
        assert oracle_capture(stones, pt(3, 2), max_depth=10**6) is True
        assert xla_capture(s, pt(3, 2)) is True
        # the other liberty of the seed stone is NOT a winning attack
        assert oracle_capture(stones, pt(2, 3), max_depth=10**6) is False
        assert xla_capture(s, pt(2, 3)) is False

    def test_planes_mark_exactly_the_winning_attack(self):
        s = make_state(staircase_board())
        cap, esc = jax.jit(ladder.ladder_planes)(s)
        cap = np.asarray(cap)
        assert cap[pt(3, 2)]
        assert not cap[pt(2, 3)]

    def test_kernel_matches_on_the_deep_chase(self):
        from dream_go_tpu.ops.env_step import pack_states
        from dream_go_tpu.ops.ladder_kernel import ladder_planes_kernel

        s = make_state(staircase_board())
        batch = jax.tree_util.tree_map(lambda x: x[None], s)
        packed = pack_states(batch)
        cap, esc = ladder_planes_kernel(
            packed[0], packed[1], batch.to_move.astype(jnp.int32))
        cap = np.asarray(cap[0])
        assert cap[pt(3, 2)]
        assert not cap[pt(2, 3)]


class TestBeyondTheBounds:
    """Shrink the bounds to pin the overflow semantics and measure slack."""

    def test_budget_overflow_fails_safe(self):
        # with a budget below the chase's needs the DFS must resolve to
        # "no capture", never to a wrong positive or an infinite loop
        s = make_state(staircase_board())
        assert xla_capture(s, pt(3, 2), budget=24) is False
        assert xla_capture(s, pt(3, 2)) is True

    def test_measured_budget_usage(self):
        # bisect the minimal budget that still finds the capture: this is
        # the DFS's true rung usage (winning line + explored alternates).
        s = make_state(staircase_board())
        lo, hi = 31, 128
        while lo < hi:
            mid = (lo + hi) // 2
            if xla_capture(s, pt(3, 2), budget=mid):
                hi = mid
            else:
                lo = mid + 1
        # depth-31 line, fail-fast alternates: about 2 rungs per step.
        # Pin the measured value so a regression in exploration order or
        # the fail-fast heuristic shows up here.
        assert lo == 62, f"measured budget usage changed: {lo}"
        assert lo * 5 <= ladder.BUDGET  # 5x slack at the default bound

    def test_stack_starvation_loses_the_capture(self):
        # exploration order is breathe-first (the failing branch is taken
        # first, the tight chase is PUSHED).  With no stack the tight line
        # is unrecoverable: the search must fail safe, not loop or crash.
        s = make_state(staircase_board())
        assert xla_capture(s, pt(3, 2), stack_cap=0) is False
        # a single stack slot is enough: pops re-stack each rung
        assert xla_capture(s, pt(3, 2), stack_cap=1) is True


class TestDeepBrokenLadders:
    """Breakers at the far end force the DFS through every alternate."""

    @pytest.mark.parametrize("breakers", [
        ((17, 17),),            # deepest single breaker: 28 rungs then fail
        ((16, 17),),
        ((12, 13), (16, 17)),   # double breaker
    ])
    def test_all_readers_agree_no_capture(self, breakers):
        stones = staircase_board(breakers=breakers)
        got, depth, calls = oracle_depth(stones, pt(3, 2))
        assert got is False
        assert calls <= 60          # full exploration stays well in budget
        s = make_state(stones)
        assert xla_capture(s, pt(3, 2)) is False

    def test_kernel_matches_on_broken_ladder(self):
        from dream_go_tpu.ops.env_step import pack_states
        from dream_go_tpu.ops.ladder_kernel import ladder_planes_kernel

        s = make_state(staircase_board(breakers=((17, 17),)))
        batch = jax.tree_util.tree_map(lambda x: x[None], s)
        packed = pack_states(batch)
        cap, _ = ladder_planes_kernel(
            packed[0], packed[1], batch.to_move.astype(jnp.int32))
        assert not np.asarray(cap[0])[pt(3, 2)]
