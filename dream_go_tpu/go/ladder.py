"""Ladder reading (capture / escape feature planes).

Replaces `src/libdg_go/utils/ladder.rs:20-150`.  The reference reads ladders
recursively with board cloning; under jit we run the SAME branching search as
an explicit-stack DFS inside a bounded ``lax.while_loop``, vectorized over a
compacted candidate set:

- only points that could start a ladder are evaluated — capture candidates
  touch an opponent chain with exactly two liberties, escape candidates touch
  an own chain in atari — gathered into ``max_candidates`` lanes per board
  (the rare overflow beyond that leaves the extra points unread, a documented
  bound; the reference evaluates all 361 but exits just as fast).
- each rung plays the attacker move, extends the first qualifying chased
  chain (opponent chain in atari that cannot counter-capture and whose lone
  liberty is playable — `ladder.rs:60-80`), then classifies: one liberty =
  captured, three+ liberties or attacker self-atari = this line fails
  (`ladder.rs:88-106`).
- at a branch point (the chased chain keeps two liberties) the reference
  recurses into *both* playable neighbors of the extension point
  (`ladder.rs:110-119`).  We continue down the first and push the second onto
  a ``STACK_CAP``-deep board stack; when a line fails we pop and resume.
  ``any``-capture semantics over the whole branch tree, exactly like the
  recursion; the stack bound and total step budget are the only
  approximations (overflow resolves to "no capture", as does the reference's
  own practical recursion limit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .engine import (
    EMPTY,
    OFFBOARD,
    GoState,
    _pad,
    chain_liberties,
    place_stones,
    pseudo_legal_mask,
)
from .topology import IOTA, NBR, NN

#: not-taken branches kept for backtracking; fail-fast exploration order
#: (see `_chase_step`) keeps real ladders at depth 1-2.  Overflow drops the
#: branch (resolves toward "no capture") — `tests/test_ladder_stress.py`
#: pins this and the measured slack.
STACK_CAP = 8
#: total rungs across all explored lines.  The measured worst case on a
#: corner-to-corner staircase is 48 explored rungs (depth 31 + fail-fast
#: alternates, `tests/test_ladder_stress.py`); the theoretical ceiling for
#: any 19x19 chase is ~120 deep (two stones consumed per rung), ~2.2x that
#: with alternates, so 320 covers every physically constructible board.
#: Raising it is free for normal boards — the `while_loop` exits on status,
#: not on the bound.
BUDGET = 320


def _board_stats(stones, chain_id, atk_color):
    """One dense pass over the board shared by every per-rung predicate.

    Returns ``(libs_cnt[362], first_lib[362], counter[362], point_libs[361])``
    indexed by chain id: liberty count, smallest liberty point (NN if none),
    whether the chain touches an ``atk_color`` chain in atari (the
    counter-capture escape of `ladder.rs:34-42`), and per-point liberty
    counts.  Same no-scatter [point x chain] formulation as
    `engine.chain_liberties`.
    """
    empty = stones == EMPTY
    member = (chain_id[:, None] == IOTA[None, :]) \
        & (stones != EMPTY)[:, None]                       # [q, c]
    member_p = jnp.concatenate([member, jnp.zeros((1, NN), bool)])
    adj = member_p[NBR[:, 0]] | member_p[NBR[:, 1]] \
        | member_p[NBR[:, 2]] | member_p[NBR[:, 3]]
    adj = adj & empty[:, None]                             # [e, c]
    libs_cnt = jnp.concatenate(
        [jnp.sum(adj, axis=0, dtype=jnp.int32), jnp.zeros(1, jnp.int32)])
    first_lib = jnp.concatenate(
        [jnp.min(jnp.where(adj, IOTA[:, None], NN), axis=0),
         jnp.full(1, NN, jnp.int32)])
    point_libs = jnp.where(
        stones != EMPTY, libs_cnt[jnp.clip(chain_id, 0, NN)], 0)

    atk = jnp.asarray(atk_color).astype(stones.dtype)
    atari_atk = (stones == atk) & (point_libs == 1)
    touch = jnp.any(_pad(atari_atk, False)[NBR], axis=1)   # [q]
    counter = jnp.concatenate(
        [jnp.any(member & touch[:, None], axis=0), jnp.zeros(1, bool)])
    return libs_cnt, first_lib, counter, point_libs


def _valid_at(stones, point_libs, color, p):
    """`_l_valid` / `board_fast.rs:216-243` on precomputed liberty counts."""
    color = jnp.asarray(color).astype(stones.dtype)
    opp = (OFFBOARD - color).astype(stones.dtype)
    nbr_p = jnp.asarray(NBR)[p]
    st = _pad(stones, jnp.int8(OFFBOARD))[nbr_p]
    pl = _pad(point_libs, 0)[nbr_p]
    ok = (jnp.any(st == EMPTY)
          | jnp.any((st == color) & (pl >= 2))
          | jnp.any((st == opp) & (pl == 1)))
    return (stones[p] == EMPTY) & ok


def _chase_step(stones, chain_id, color, attack_p, pre_libs=None):
    """One rung: attacker plays ``attack_p``, the chased chain extends.

    Returns ``(stones2, chain_id2, status, c1, c2, libs2)`` — the
    post-extension board, status 0 = branch (continue), 1 = captured,
    2 = line fails, the two candidate continuation attacks (NN = none),
    which are the playable neighbors of the extension point in reference
    neighbor order (`ladder.rs:110-119`), and the post-extension liberty
    table (for the next rung's placement — ``pre_libs`` is this board's
    table from the previous rung, halving the [point x chain] reductions
    per rung).
    """
    color = jnp.asarray(color).astype(stones.dtype)
    opp = (OFFBOARD - color).astype(stones.dtype)
    st1, cid1 = place_stones(stones, chain_id, color, attack_p,
                             chain_libs=pre_libs)
    libs_cnt, first_lib, counter, point_libs = _board_stats(st1, cid1, color)

    # first adjacent opponent chain in atari that cannot counter-capture and
    # whose lone liberty is playable for the defender (`ladder.rs:60-80`)
    st1p = _pad(st1, jnp.int8(OFFBOARD))
    cid1p = _pad(cid1, -1)
    found = jnp.bool_(False)
    ext = jnp.int32(NN)
    for k in range(4):
        q = jnp.asarray(NBR)[attack_p, k]
        cid = jnp.clip(cid1p[q], 0, NN)
        lib = first_lib[cid]
        ok = ((st1p[q] == opp) & (libs_cnt[cid] == 1) & ~counter[cid]
              & (lib < NN)
              & _valid_at(st1, point_libs, opp, jnp.minimum(lib, NN - 1)))
        ext = jnp.where(ok & ~found, lib, ext)
        found = found | ok

    ext_c = jnp.minimum(ext, NN - 1)
    st2, cid2 = place_stones(st1, cid1, opp, ext_c, chain_libs=libs_cnt)
    libs_cnt2, _, _, point_libs2 = _board_stats(st2, cid2, color)
    def_libs = libs_cnt2[jnp.clip(cid2[ext_c], 0, NN)]

    # extension puts an attacker chain in atari => escaped (`ladder.rs:97-106`)
    nbr_e = jnp.asarray(NBR)[ext_c]
    st2p = _pad(st2, jnp.int8(OFFBOARD))[nbr_e]
    pl2p = _pad(point_libs2, 0)[nbr_e]
    self_atari = jnp.any((st2p == color) & (pl2p == 1))

    status = jnp.where(
        ~found, 2,
        jnp.where(def_libs <= 1, 1,
                  jnp.where((def_libs >= 3) | self_atari, 2, 0)))

    # branch candidates: playable neighbors of the extension, in order
    c1 = jnp.int32(NN)
    c2 = jnp.int32(NN)
    for k in range(4):
        q = nbr_e[k]
        v = (q < NN) & _valid_at(st2, point_libs2, color,
                                 jnp.minimum(q, NN - 1))
        take1 = v & (c1 == NN)
        take2 = v & ~take1 & (c2 == NN)
        c1 = jnp.where(take1, q, c1)
        c2 = jnp.where(take2, q, c2)

    # exploration order ("any" semantics make it correctness-free): explore
    # the branch that lets the defender breathe FIRST — it dies in one rung —
    # and stack the tight chase.  Keeps the DFS stack O(1) deep on zigzag
    # ladders instead of one pushed side-branch per rung.  The chased chain's
    # two liberties are exactly {c1, c2}, so attacking ci forces the defender
    # into the other; its liberties then are the empty neighbors of that
    # point minus the attack stone (capture gains ignored — order heuristic
    # only).
    def after_libs(attack, extend):
        nbrs = jnp.asarray(NBR)[jnp.minimum(extend, NN - 1)]
        st_n = _pad(st2, jnp.int8(OFFBOARD))[nbrs]
        return jnp.sum((st_n == EMPTY) & (nbrs != attack))

    both = (c1 < NN) & (c2 < NN)
    swap = both & (after_libs(c2, c1) > after_libs(c1, c2))
    c1s = jnp.where(swap, c2, c1)
    c2s = jnp.where(swap, c1, c2)
    return st2, cid2, status, c1s, c2s, libs_cnt2


def _chase(stones, chain_id, color, p, active, greedy: bool, libs=None,
           budget: int | None = None, stack_cap: int | None = None):
    """DFS body shared by every ladder query; ``active=False`` lanes exit
    immediately (they ride along in a pooled vmap, see
    :func:`ladder_planes`).  ``libs`` is the board's liberty table
    (``chain_liberties(stones, chain_id)[1]``) if the caller already has
    it; each rung then reuses the running table instead of recomputing.
    ``budget``/``stack_cap`` override the module bounds (used by the
    stress tests to pin behavior at and beyond them)."""
    if budget is None:
        budget = BUDGET
    if stack_cap is None:
        stack_cap = STACK_CAP
    # allocation size: dynamic_update needs >=1 rows even when the logical
    # cap is 0 (the push predicate still uses the logical cap)
    alloc_cap = 1 if greedy else max(stack_cap, 1)
    if libs is None:
        from .engine import chain_liberties

        libs = chain_liberties(stones, chain_id)[1]

    def cond(c):
        status, depth = c[3], c[4]
        return (status == 0) & (depth < budget)

    def body(c):
        st, cid, attack, status, depth, lb, sst, scid, slb, sat, sp = c
        st2, cid2, s, c1, c2, lb2 = _chase_step(st, cid, color, attack, lb)
        if greedy:
            # _chase_step orders (breathe-first, tight); take the tight
            # line when both exist and drop the alternative.
            c1 = jnp.where(c2 < NN, c2, c1)
            c2 = jnp.int32(NN)
        cont = (s == 0) & (c1 < NN)
        fail = (s == 2) | ((s == 0) & (c1 >= NN))

        push = cont & (c2 < NN) & (sp < stack_cap)
        spc = jnp.clip(sp, 0, alloc_cap - 1)
        sst = jnp.where(push, lax.dynamic_update_index_in_dim(
            sst, st2, spc, 0), sst)
        scid = jnp.where(push, lax.dynamic_update_index_in_dim(
            scid, cid2, spc, 0), scid)
        slb = jnp.where(push, lax.dynamic_update_index_in_dim(
            slb, lb2, spc, 0), slb)
        sat = jnp.where(push, lax.dynamic_update_index_in_dim(
            sat, c2, spc, 0), sat)
        sp = sp + push

        pop = fail & (sp > 0)
        spm = jnp.clip(sp - 1, 0, alloc_cap - 1)
        st_n = jnp.where(cont, st2, jnp.where(pop, sst[spm], st2))
        cid_n = jnp.where(cont, cid2, jnp.where(pop, scid[spm], cid2))
        lb_n = jnp.where(cont, lb2, jnp.where(pop, slb[spm], lb2))
        attack_n = jnp.where(cont, c1, jnp.where(pop, sat[spm], NN))
        sp = jnp.where(pop, sp - 1, sp)
        status_n = jnp.where(s == 1, 1, jnp.where(cont | pop, 0, 2))
        return (st_n, cid_n, attack_n, status_n, depth + 1, lb_n,
                sst, scid, slb, sat, sp)

    init = (stones, chain_id, jnp.asarray(p, jnp.int32),
            jnp.where(jnp.asarray(active), 0, 2).astype(jnp.int32),
            jnp.int32(0),
            jnp.asarray(libs, jnp.int32),
            jnp.zeros((alloc_cap, NN), stones.dtype),
            jnp.zeros((alloc_cap, NN), chain_id.dtype),
            jnp.zeros((alloc_cap, NN + 1), jnp.int32),
            jnp.full((alloc_cap,), NN, jnp.int32),
            jnp.int32(0))
    status = lax.while_loop(cond, body, init)[3]
    return status == 1


def is_ladder_capture(stones, chain_id, color, p,
                      greedy: bool = False, budget: int | None = None,
                      stack_cap: int | None = None) -> jax.Array:
    """bool: playing ``color`` at ``p`` starts a winning ladder chase.

    Explicit-stack DFS over the reference's branch recursion
    (`ladder.rs:53-119`): continue down the first branch, stack the second,
    pop on a failed line; captured anywhere => True.

    ``greedy`` chases only the tighter branch (the one-move lookahead that
    leaves the defender fewest liberties) and never backtracks — a single
    forced line, measured ~98% per-candidate agreement with the exact DFS
    on real-game positions and ~96% on uniform-random torture boards
    (`tools/measure_ladder_greedy.py`); kept as an opt-in fast path.
    """
    return _chase(stones, chain_id, color, p, True, greedy,
                  budget=budget, stack_cap=stack_cap)


def _escape_jobs(stones, chain_id, color, p, root_libs=None):
    """Escape preparation shared by :func:`is_ladder_escape` and the pooled
    planes: place ``color`` at ``p`` and return
    ``(st2, cid2, feasible, attacks[4], playable[4], libs2)`` — the
    post-extension board, the opponent counter-attack points that must ALL
    fail as ladder captures (`ladder.rs:136-178`), and the post-extension
    liberty table for the chases."""
    color_c = jnp.asarray(color).astype(stones.dtype)
    opp = (OFFBOARD - jnp.asarray(color)).astype(stones.dtype)

    # must connect to an own chain in atari
    if root_libs is None:
        _, root_libs = chain_liberties(stones, chain_id)
    nbr_p = jnp.asarray(NBR)[p]
    nbr_st = _pad(stones, jnp.int8(OFFBOARD))[nbr_p]
    nbr_cid = _pad(chain_id, -1)[nbr_p]
    nbr_libs = root_libs[jnp.clip(nbr_cid, 0, NN)]
    connected = jnp.any((nbr_st == color_c) & (nbr_libs == 1))

    st2, cid2 = place_stones(stones, chain_id, color, p,
                             chain_libs=root_libs)
    libs_cnt2, _, _, point_libs2 = _board_stats(st2, cid2, color)
    cnt = libs_cnt2[jnp.clip(cid2[p], 0, NN)]
    feasible = connected & (cnt == 2)

    attacks = jnp.minimum(nbr_p, NN - 1)
    playable = (nbr_p < NN) & jax.vmap(
        lambda q: _valid_at(st2, point_libs2, opp, q))(attacks)
    return st2, cid2, feasible, attacks, playable, libs_cnt2


def is_ladder_escape(stones, chain_id, color, p,
                     greedy: bool = False, budget: int | None = None,
                     stack_cap: int | None = None) -> jax.Array:
    """bool: playing ``color`` at ``p`` escapes an atari via a failed ladder
    for the opponent (`ladder.rs:136-178`): the opponent must fail to
    ladder-capture from every playable adjacent point."""
    opp = (OFFBOARD - jnp.asarray(color)).astype(stones.dtype)
    st2, cid2, feasible, attacks, playable, libs2 = _escape_jobs(
        stones, chain_id, color, p)
    captured = jax.vmap(
        lambda q, ok: _chase(st2, cid2, opp, q, ok, greedy, libs2,
                             budget=budget, stack_cap=stack_cap)
    )(attacks, playable)
    return feasible & ~jnp.any(captured)


def ladder_planes(state: GoState, max_candidates: int = 24,
                  greedy: bool = False, max_escapes: int = 8):
    """(capture[361] bool, escape[361] bool) for the player to move.

    Feature planes 31/32 (`features.rs:208-222`).  Candidates beyond
    ``max_candidates`` (captures) / ``max_escapes`` (escapes) per board are
    left unevaluated (False).

    Every chase in the position runs as one lane of a SINGLE pooled DFS
    vmap — capture candidates directly, each escape candidate as up to 4
    counter-capture lanes on its post-extension board (all of which must
    fail, `ladder.rs:136-178`).  One ``while_loop`` in the whole program
    instead of one per cond-branch keeps XLA:TPU compile time sane, and the
    formerly sequential escape checks ride the same lockstep iteration.
    """
    stones, chain_id = state.stones, state.chain_id
    color = state.to_move
    opp = (OFFBOARD - color).astype(stones.dtype)
    _, chain_libs = chain_liberties(stones, chain_id)
    pseudo = pseudo_legal_mask(state, color)

    nbr_st = _pad(stones, jnp.int8(OFFBOARD))[NBR]       # [361, 4]
    nbr_cid = _pad(chain_id, -1)[NBR]
    nbr_libs = chain_libs[jnp.clip(nbr_cid, 0, NN)]
    cap_cand = pseudo & jnp.any((nbr_st == opp) & (nbr_libs == 2), axis=1)
    esc_cand = pseudo & jnp.any((nbr_st == color) & (nbr_libs == 1), axis=1)

    cap_slots = jnp.sort(jnp.where(cap_cand, IOTA, NN))[:max_candidates]
    esc_slots = jnp.sort(jnp.where(esc_cand, IOTA, NN))[:max_escapes]
    cap_ok = cap_slots < NN
    esc_ok = esc_slots < NN
    cap_pts = jnp.minimum(cap_slots, NN - 1)
    esc_pts = jnp.minimum(esc_slots, NN - 1)

    # escape jobs: post-extension board + up to 4 counter-attack lanes each
    est, ecid, feasible, eatk, eplay, elibs = jax.vmap(
        lambda q: _escape_jobs(stones, chain_id, color, q, chain_libs)
    )(esc_pts)
    feasible = feasible & esc_ok
    eplay = eplay & feasible[:, None]

    # one job pool: [max_candidates] captures ++ [max_escapes*4] escapes
    j_st = jnp.concatenate([
        jnp.broadcast_to(stones, (max_candidates, NN)),
        jnp.repeat(est, 4, axis=0)])
    j_cid = jnp.concatenate([
        jnp.broadcast_to(chain_id, (max_candidates, NN)),
        jnp.repeat(ecid, 4, axis=0)])
    j_color = jnp.concatenate([
        jnp.broadcast_to(color, (max_candidates,)),
        jnp.broadcast_to(opp, (max_escapes * 4,))])
    j_attack = jnp.concatenate([cap_pts, eatk.reshape(-1)])
    j_active = jnp.concatenate([cap_ok, eplay.reshape(-1)])
    j_libs = jnp.concatenate([
        jnp.broadcast_to(chain_libs.astype(jnp.int32),
                         (max_candidates, NN + 1)),
        jnp.repeat(elibs.astype(jnp.int32), 4, axis=0)])

    captured = jax.vmap(
        lambda st, cid, c, a, ok, lb: _chase(st, cid, c, a, ok, greedy, lb)
    )(j_st, j_cid, j_color, j_attack, j_active, j_libs)

    caps = captured[:max_candidates]
    esc_failed = jnp.any(
        captured[max_candidates:].reshape(max_escapes, 4), axis=1)
    escs = feasible & ~esc_failed

    capture = jnp.zeros(NN, bool).at[cap_pts].max(caps & cap_ok)
    escape = jnp.zeros(NN, bool).at[esc_pts].max(escs & esc_ok)
    return capture, escape


def ladder_planes_batch(states: GoState, chunk: int = 128,
                        max_candidates: int = 24, greedy: bool = False,
                        use_kernel: bool | None = None):
    """Batched :func:`ladder_planes` with bounded memory.

    On a TPU backend the exact reader runs as the Pallas kernel
    (`ops/ladder_kernel.py`): boards and the DFS branch stacks live in
    VMEM, per-point chain-liberty rows are maintained incrementally
    across rungs, each board's grid step runs only its own candidates
    (ALL of them — no ``max_candidates`` bound) to their own chase
    depths.  The XLA pooled-lane form below is the portable path: the
    per-candidate DFS stacks are live for every candidate of every board
    at once under a flat vmap (~20GB at batch 1024); chunking the batch
    through ``lax.map`` keeps at most ``chunk`` games' ladder state
    resident while staying one compiled program.

    NOTE on bounds: ``chunk``/``max_candidates`` apply ONLY to the XLA
    path.  The kernel evaluates every candidate (like `ladder.rs`, which
    bounds nothing), so on boards with more than ``max_candidates``
    capture starts (or 8 escape starts) the backends differ by a TESTED
    contract (`tests/test_ladder_bounds.py`): the XLA path is an exact
    prefix truncation — it matches the kernel on the first
    ``max_candidates``/``max_escapes`` candidates in point order, leaves
    the tail False, and matches the kernel everywhere once the bounds are
    raised past the board's candidate count.  Callers that need the
    bounded XLA semantics on a TPU backend must pass ``use_kernel=False``
    explicitly.
    """
    if use_kernel is None:
        import jax as _jax

        use_kernel = (not greedy) and _jax.default_backend() == "tpu"
    if use_kernel and max_candidates != 24:
        import warnings

        warnings.warn(
            "ladder_planes_batch: the Pallas kernel evaluates ALL "
            "candidates; max_candidates=%d is ignored on this path"
            % max_candidates, stacklevel=2)
    if use_kernel:
        from ..ops.env_step import pack_states
        from ..ops.ladder_kernel import ladder_planes_kernel

        packed = pack_states(states)
        return ladder_planes_kernel(
            packed[0], packed[1], states.to_move.astype(jnp.int32))
    b = states.stones.shape[0]
    one = lambda s: ladder_planes(s, max_candidates, greedy)
    if b <= chunk or b % chunk != 0:
        return jax.vmap(one)(states)
    stacked = jax.tree_util.tree_map(
        lambda x: x.reshape((b // chunk, chunk) + x.shape[1:]), states)
    out = lax.map(lambda s: jax.vmap(one)(s), stacked)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((b,) + x.shape[2:]), out)
