"""Candidate-bound contract between the ladder backends (VERDICT r4 #6).

The Pallas kernel (`ops/ladder_kernel.py`) evaluates EVERY prefiltered
candidate on the board — matching the reference, which bounds nothing
(`/root/reference/src/libdg_go/utils/features.rs:101-148` calls the ladder
reader for every candidate vertex).  The portable XLA path
(`go/ladder.py::ladder_planes`) pools its DFS lanes and therefore caps at
``max_candidates`` capture starts / ``max_escapes`` escape starts per
board, taking the FIRST candidates in point order and leaving the tail
unevaluated (False).

These tests construct boards with 48 simultaneous capture candidates and
12 escape candidates — far past both defaults — and pin the exact
contract against the uncapped recursive oracle:

- kernel == oracle on every candidate (no bound);
- default XLA == oracle on the first 24/8 candidates in point order and
  exactly False on the tail (the bound is a prefix truncation, nothing
  else differs);
- XLA with raised bounds == oracle everywhere (the bound is the ONLY
  divergence between the backends).
"""

import jax.numpy as jnp
import numpy as np

from dream_go_tpu.go import engine, ladder
from dream_go_tpu.go import reference as R
from dream_go_tpu.ops.env_step import pack_states
from dream_go_tpu.ops.ladder_kernel import ladder_planes_kernel

N = 19
BLACK, WHITE = 1, 2


def pt(r, c):
    return r * N + c


def make_state(stones, to_move=BLACK):
    """GoState from a raw 361 stones list (int 0/1/2)."""
    arr = np.asarray(stones, np.int8)
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
    return engine.new_state().replace(
        stones=jnp.asarray(arr), chain_id=jnp.asarray(cid),
        to_move=jnp.int8(to_move))


def _nbrs(p):
    r, c = divmod(p, N)
    out = []
    if r > 0:
        out.append(p - N)
    if c > 0:
        out.append(p - 1)
    if c < N - 1:
        out.append(p + 1)
    if r < N - 1:
        out.append(p + N)
    return out


def _board(stones):
    b = R.PyBoard()
    b.stones = list(int(x) for x in stones)
    return b


def _candidates(b):
    """(capture_pts, escape_pts) in point order — the prefilter both
    backends share (opp chain on 2 libs / own chain in atari)."""
    caps, escs = [], []
    for p in range(engine.NN):
        if not b.is_pseudo_legal(BLACK, p):
            continue
        if any(b.stones[q] == WHITE and b.num_liberties(q) == 2
               for q in _nbrs(p)):
            caps.append(p)
        if any(b.stones[q] == BLACK and b.num_liberties(q) == 1
               for q in _nbrs(p)):
            escs.append(p)
    return caps, escs


def capture_swarm():
    """24 independent capturable-or-not white units -> 48 capture starts.

    Each unit is a white stone on exactly 2 liberties boxed by black so
    that attacking from below captures outright (the escape upward is
    self-capture) while attacking from above lets white slide out — a
    deterministic True/False pair per unit, spread across the whole board
    so True candidates exist far past the 24-slot default.
    """
    stones = [0] * (N * N)
    for r in (2, 7, 12, 17):
        for c in (1, 4, 7, 10, 13, 16):
            stones[pt(r, c)] = WHITE
            for br, bc in ((r, c - 1), (r, c + 1), (r - 2, c),
                           (r - 1, c - 1), (r - 1, c + 1)):
                stones[pt(br, bc)] = BLACK
    return stones


def escape_swarm():
    """12 black-in-atari units -> 12 escape starts, every one True.

    Each unit leaves black one liberty; extending there lands on exactly
    two liberties (feasible), and black breaker stones flank both chase
    entries so either white counter-attack hands the chain a third
    liberty at its first extension — all counter-ladders fail, the escape
    reads True, and True candidates exist past the 8-slot default.
    """
    stones = [0] * (N * N)
    for r in (2, 6, 10, 14):
        for c in (3, 10, 16):
            stones[pt(r, c)] = BLACK
            for br, bc in ((r + 1, c - 2), (r + 1, c + 2)):
                stones[pt(br, bc)] = BLACK
            for wr, wc in ((r, c - 1), (r, c + 1), (r - 1, c), (r + 2, c)):
                stones[pt(wr, wc)] = WHITE
    return stones


def _oracle_planes(b, caps, escs):
    cap = {p: b.is_ladder_capture(BLACK, p) for p in caps}
    esc = {p: b.is_ladder_escape(BLACK, p) for p in escs}
    return cap, esc


def _kernel_planes(state):
    packed = pack_states(
        __import__("jax").tree_util.tree_map(lambda x: x[None], state))
    cap, esc = ladder_planes_kernel(
        packed[0], packed[1], state.to_move.astype(jnp.int32)[None],
        interpret=True)
    return np.asarray(cap[0]), np.asarray(esc[0])


class TestCaptureBound:
    def setup_method(self, _):
        self.stones = capture_swarm()
        self.state = make_state(self.stones)
        self.b = _board(self.stones)
        self.caps, self.escs = _candidates(self.b)

    def test_board_exceeds_default_bound(self):
        assert len(self.caps) == 48  # 24 units x 2 starts > 24 default
        ocap, _ = _oracle_planes(self.b, self.caps, [])
        # True results exist BEYOND the 24-candidate prefix, so a skipped
        # candidate is distinguishable from an evaluated-False one
        assert any(ocap[p] for p in self.caps[24:])

    def test_kernel_evaluates_all_candidates(self):
        ocap, _ = _oracle_planes(self.b, self.caps, [])
        kcap, _ = _kernel_planes(self.state)
        for p in self.caps:
            assert bool(kcap[p]) == ocap[p], p

    def test_default_xla_is_prefix_truncation(self):
        ocap, _ = _oracle_planes(self.b, self.caps, [])
        xcap, _ = ladder.ladder_planes(self.state)  # default bounds
        xcap = np.asarray(xcap)
        for p in self.caps[:24]:
            assert bool(xcap[p]) == ocap[p], p
        for p in self.caps[24:]:
            assert not xcap[p], p  # unevaluated tail, NOT oracle values

    def test_raised_xla_matches_kernel_exactly(self):
        kcap, kesc = _kernel_planes(self.state)
        xcap, xesc = ladder.ladder_planes(self.state, max_candidates=64,
                                          max_escapes=16)
        np.testing.assert_array_equal(np.asarray(xcap), kcap)
        np.testing.assert_array_equal(np.asarray(xesc), kesc)


class TestEscapeBound:
    def setup_method(self, _):
        self.stones = escape_swarm()
        self.state = make_state(self.stones)
        self.b = _board(self.stones)
        self.caps, self.escs = _candidates(self.b)

    def test_board_exceeds_default_bound(self):
        assert len(self.escs) == 12  # > 8 default
        _, oesc = _oracle_planes(self.b, [], self.escs)
        assert any(oesc[p] for p in self.escs[8:])

    def test_kernel_evaluates_all_candidates(self):
        _, oesc = _oracle_planes(self.b, [], self.escs)
        _, kesc = _kernel_planes(self.state)
        for p in self.escs:
            assert bool(kesc[p]) == oesc[p], p

    def test_default_xla_is_prefix_truncation(self):
        _, oesc = _oracle_planes(self.b, [], self.escs)
        _, xesc = ladder.ladder_planes(self.state)
        xesc = np.asarray(xesc)
        for p in self.escs[:8]:
            assert bool(xesc[p]) == oesc[p], p
        for p in self.escs[8:]:
            assert not xesc[p], p

    def test_raised_xla_matches_kernel_exactly(self):
        kcap, kesc = _kernel_planes(self.state)
        xcap, xesc = ladder.ladder_planes(self.state, max_candidates=64,
                                          max_escapes=16)
        np.testing.assert_array_equal(np.asarray(xcap), kcap)
        np.testing.assert_array_equal(np.asarray(xesc), kesc)
