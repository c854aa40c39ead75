"""On-device batched MCTS: PUCT search over array trees.

Replaces `src/libdg_mcts/tree.rs` + `pool/` (2.8k LoC of lock-free pointer
trees, spinlocks, and worker threads).  The TPU-native inversion: one
fixed-capacity array tree per game, thousands of games searched in lockstep —
each simulation step runs select/expand (vmapped), one *batched* network
evaluation across all games, then insert/backup (vmapped), inside a single
jitted ``fori_loop``.  Cross-game batching replaces the reference's
virtual-loss-driven leaf batching (SURVEY §2.11 P1-P3): with one leaf per
game per step there is no intra-tree contention, so no virtual loss, no
spinlocks, no expanding-flag CAS.

Tree memory layout mirrors the reference's two-tier children storage
(`tree.rs:535-991`): every node stores its FULL prior row (`tree.rs:
1070-1088` prior[368], here bf16) plus a candidacy bitset, but per-edge
visit/value/child stats live in a small sparse slot table
(``children_slots``, default 32 — the reference runs 8 ``SmallChildrenImpl``
slots until promotion).  The root is permanently "promoted": full-width
[362] child/visit/value arrays, since it takes the whole rollout budget and
the Dirichlet noise.  Re-rooting densifies the new root's slots back to
full width, so the slot cap never constrains the node currently receiving
1600 visits.  This cuts per-node HBM ~2x vs dense [362]-wide edge arrays —
the difference between batch 192 and batch 512+ fitting next to the
flagship net on a 16G chip.

Reference formula parity:
- PUCT select (`tree.rs:63-114`): ``score = Q + prior * uct_exp(n) *
  sqrt(1+n) / (1+count)`` (count 0 -> bonus ``uct_exp*sqrt(1+n)``), with the
  visit-interpolated ``uct_exp`` schedule.
- FPU (`tree.rs:196-239`): unvisited children read
  ``max(initial_value - fpu_reduce(n), 0)``; not applied at the root.
- Backup (`tree.rs:125-159`): per-node mean + Welford value_s, with
  perspective flips (child nodes store the value for *their* player to move,
  so the parent's edge Q is ``1 - child_mean``).
- Final selection (`tree.rs:1262-1282, 1524-1558`): temperature `choose`
  over visit counts for the opening, else greedy by LCB
  (``normal_lcb``, min 80 visits) with count/prior tie-breaking.
- Root priors: candidate-masked, renormalized, mixed with Dirichlet(0.03)
  noise at beta = 0.25 (`dirichlet.rs:27-77`, `lib.rs:162-165`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from ..config import SearchConfig
from ..go import engine, features
from ..go.engine import GoState
from ..go.options import scoring_mask, standard_mask
from ..utils.lcb import normal_lcb
from .choose import choose
from .predictor import Predictor

A = 362  # actions: 361 points + pass
NCW = 12  # candidate bitset words (12 x 32 >= 362)
MIN_LCB_VISITS = 80  # tree.rs:34
MAX_BACKUP_DEPTH = 128  # select/backup path bound: the recorded chain (and
#                         its per-sim gather/scatter width) stops here; a
#                         walk that somehow exceeds it re-expands the edge
#                         at level 127 instead (practical searches stay far
#                         below; a pure line tree of >128 sims would orphan
#                         one node per extra sim)


class PackedStates(struct.PyTreeNode):
    """Tree-resident board state in the Pallas kernel layout.

    Same per-board layout as `ops/env_step.pack_states`, narrowed for HBM
    (i8 stones, i16 chain ids, 64-entry ring) — widened per gathered row
    when fed to `ops/leaf_step.leaf_step`.  Leading axis is the node index
    (batch via vmap, like GoState in the XLA path).
    """

    stones: jax.Array   # i8[N, 384]
    cid: jax.Array      # i16[N, 384]
    cxp: jax.Array      # i32[N, 2, 384]  (u32 bit patterns)
    hist: jax.Array     # i32[N, 2, 64]   super-ko ring
    meta: jax.Array     # i32[N, 8]  to_move, placed, move_count, pass_count,
    #                                done, last0, last1, pad
    hashw: jax.Array    # i32[N, 2]
    komi: jax.Array     # f32[N] (constant per game)


def pack_rows(states: GoState) -> PackedStates:
    """Batched GoState -> narrow kernel-layout rows (one per board)."""
    from ..ops import env_step as ES

    stones, cid, cxp, hist, meta, hashw = ES.pack_states(states)
    return PackedStates(
        stones=stones[:, 0].astype(jnp.int8),
        cid=cid[:, 0].astype(jnp.int16),
        cxp=cxp,
        hist=hist[:, :, :ES.RING],
        meta=meta[:, 0],
        hashw=hashw[:, 0, :2],
        komi=states.komi,
    )


def _widen_rows(ps: PackedStates):
    """Narrow rows -> the six wide arrays `leaf_step` consumes."""
    from ..ops.env_step import RING

    b = ps.stones.shape[0]
    return (
        ps.stones.astype(jnp.int32)[:, None, :],
        ps.cid.astype(jnp.int32)[:, None, :],
        ps.cxp,
        jnp.concatenate(
            [ps.hist, jnp.zeros((b, 2, 128 - RING), jnp.int32)], axis=2),
        ps.meta[:, None, :],
        jnp.concatenate(
            [ps.hashw, jnp.zeros((b, 6), jnp.int32)], axis=1)[:, None, :],
    )


def _narrow_rows(leaf_packed, komi: jax.Array) -> PackedStates:
    from ..ops.env_step import RING

    stones, cid, cxp, hist, meta, hashw = leaf_packed
    return PackedStates(
        stones=stones[:, 0].astype(jnp.int8),
        cid=cid[:, 0].astype(jnp.int16),
        cxp=cxp,
        hist=hist[:, :, :RING],
        meta=meta[:, 0],
        hashw=hashw[:, 0, :2],
        komi=komi,
    )


def unpack_rows(ps: PackedStates) -> GoState:
    """Narrow rows -> batched GoState (for XLA-side consumers)."""
    from ..ops import env_step as ES

    b = ps.stones.shape[0]
    template = engine.new_states(b)
    wide = _widen_rows(ps)
    out = ES.unpack_states(template, *wide)
    return out.replace(komi=ps.komi)


def _states_to_move(states, n=None):
    """to_move accessor across the two state layouts."""
    if isinstance(states, PackedStates):
        m = states.meta[..., 0] if n is None else states.meta[n, 0]
        return m.astype(jnp.int8)
    return states.to_move if n is None else states.to_move[n]


def pack_cand(c: jax.Array) -> jax.Array:
    """bool[..., A] candidate mask -> uint32[..., NCW] bitset."""
    pad = NCW * 32 - A
    cp = jnp.concatenate(
        [c, jnp.zeros(c.shape[:-1] + (pad,), bool)], axis=-1)
    cp = cp.reshape(c.shape[:-1] + (NCW, 32)).astype(jnp.uint32)
    return (cp << jnp.arange(32, dtype=jnp.uint32)).sum(
        axis=-1, dtype=jnp.uint32)


def unpack_cand(w: jax.Array) -> jax.Array:
    """uint32[..., NCW] bitset -> bool[..., A] candidate mask."""
    bits = (w[..., :, None] >> jnp.arange(32, dtype=jnp.uint32)) & 1
    return bits.reshape(w.shape[:-1] + (NCW * 32,))[..., :A].astype(bool)


class Tree(struct.PyTreeNode):
    """Fixed-capacity array tree for one game (batch via vmap).

    Node 0 is the root; new nodes are appended at index ``size``.  Edges are
    two-tier (`tree.rs:535-991`): the root holds full-width [A] child /
    visit / value arrays; non-root nodes hold ``K = children_slots`` sparse
    slots.  Every node stores its full prior row (bf16) and candidacy
    bitset, so a re-rooted child recovers full width losslessly.
    """

    states: GoState | PackedStates  # stacked [N] board state per node
    prior: jax.Array         # bf16[N, A] masked+renormalized priors
    cand: jax.Array          # u32[N, NCW] policy-checker candidacy bitset
    root_child: jax.Array    # i32[A], -1 = absent (root edges, full width)
    root_edge_n: jax.Array   # i32[A] root per-edge visits
    root_edge_w: jax.Array   # f32[A] root per-edge value sums (root persp.)
    slot_action: jax.Array   # i32[N, K], -1 = empty slot
    slot_child: jax.Array    # i32[N, K], child node id (>= 0 iff occupied)
    slot_n: jax.Array        # i32[N, K] per-edge visits
    slot_w: jax.Array        # f32[N, K] per-edge value sums (parent persp.)
    parent: jax.Array        # i32[N], -1 for root
    parent_action: jax.Array  # i32[N] action INTO the node
    parent_slot: jax.Array   # i32[N] slot in parent (-1 when parent is root)
    node_n: jax.Array        # i32[N] visit count
    node_w: jax.Array        # f32[N] value sum (node-to-move perspective)
    node_m2: jax.Array       # f32[N] Welford sum of squared deviations
    node_to_move: jax.Array  # i32[N] to-move at each node (compact copy of
    #                          the state row, so backup's perspective flips
    #                          gather one scalar, not a packed-state row)
    value0: jax.Array        # f32[N] net value at node (initial_value)
    size: jax.Array          # i32 allocated nodes


def _node_mean(tree: Tree, idx) -> jax.Array:
    return tree.node_w[idx] / jnp.maximum(tree.node_n[idx], 1)


def init_tree(state: GoState, value: jax.Array, policy: jax.Array,
              candidate: jax.Array, noise_rng: jax.Array | None,
              cfg: SearchConfig, num_nodes: int) -> Tree:
    """Allocate a tree and install the evaluated root."""
    n = num_nodes
    k = cfg.children_slots
    states = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), state)
    prior = _masked_prior(policy, candidate)
    if noise_rng is not None and cfg.dirichlet_noise > 0:
        prior = _dirichlet_mix(noise_rng, prior, candidate,
                               cfg.dirichlet_noise, cfg.dirichlet_alpha)
    v = _sane_value(value)
    return Tree(
        states=states,
        prior=jnp.zeros((n, A), jnp.bfloat16).at[0].set(
            prior.astype(jnp.bfloat16)),
        cand=jnp.zeros((n, NCW), jnp.uint32).at[0].set(pack_cand(candidate)),
        root_child=jnp.full((A,), -1, jnp.int32),
        root_edge_n=jnp.zeros((A,), jnp.int32),
        root_edge_w=jnp.zeros((A,)),
        slot_action=jnp.full((n, k), -1, jnp.int32),
        slot_child=jnp.full((n, k), -1, jnp.int32),
        slot_n=jnp.zeros((n, k), jnp.int32),
        slot_w=jnp.zeros((n, k)),
        parent=jnp.full((n,), -1, jnp.int32),
        parent_action=jnp.zeros((n,), jnp.int32),
        parent_slot=jnp.full((n,), -1, jnp.int32),
        node_n=jnp.zeros((n,), jnp.int32).at[0].set(1),
        node_w=jnp.zeros((n,)).at[0].set(v),
        node_m2=jnp.zeros((n,)),
        node_to_move=jnp.broadcast_to(
            _states_to_move(state).astype(jnp.int32), (n,)),
        value0=jnp.zeros((n,)).at[0].set(v),
        size=jnp.int32(1),
    )


def _sane_value(v):
    return jnp.where(jnp.isfinite(v), jnp.clip(v, 0.0, 1.0), 0.5)


def _masked_prior(policy: jax.Array, candidate: jax.Array) -> jax.Array:
    """Mask to candidates + renormalize; uniform fallback when degenerate
    (`pool/policy_helper.rs:86-134` normalize_policy)."""
    p = jnp.where(candidate & jnp.isfinite(policy), policy, 0.0)
    p = jnp.maximum(p, 0.0)
    total = jnp.sum(p)
    uniform = candidate / jnp.maximum(jnp.sum(candidate), 1)
    return jnp.where(total > 1e-12, p / jnp.maximum(total, 1e-12), uniform)


def _dirichlet_mix(rng, prior, candidate, beta, alpha):
    """(1-b)*p + b*Dir(alpha) over candidate entries (`dirichlet.rs:27-77`)."""
    g = jax.random.gamma(rng, alpha, (A,))
    g = jnp.where(candidate, g, 0.0)
    g = g / jnp.maximum(jnp.sum(g), 1e-12)
    return jnp.where(candidate, (1.0 - beta) * prior + beta * g, prior)


def root_candidate(tree: Tree) -> jax.Array:
    """bool[A] root candidacy mask (unbatched tree; vmap for batches)."""
    return unpack_cand(tree.cand[0])


# ---------------------------------------------------------------------------
# flat-tree hot path
#
# The simulation loop runs on a FLATTENED tree: per-node leaves [B, C, ...]
# viewed as [B*C, ...] with explicit global row ids, while the per-GAME
# root arrays ([B, A]) and size stay unflattened.  Per-lane indexing under
# vmap lowers on TPU to masked whole-array selects (a full [B, C, ...]
# rewrite per update); plain row gathers and unique-index row scatters on
# the flat view lower to the efficient dynamic-slice paths.

_GAME_FIELDS = ("root_child", "root_edge_n", "root_edge_w", "size")


def _flatten_trees(trees: Tree) -> Tree:
    """Node-axis leaves [B, C, ...] -> [B*C, ...] views (free reshape)."""
    kw = {}
    for f in dataclasses.fields(trees):
        v = getattr(trees, f.name)
        if f.name in _GAME_FIELDS:
            kw[f.name] = v
        elif f.name == "states":
            kw[f.name] = jax.tree_util.tree_map(
                lambda x: x.reshape((-1,) + x.shape[2:]), v)
        else:
            kw[f.name] = v.reshape((-1,) + v.shape[2:])
    return Tree(**kw)


def _unflatten_trees(tf: Tree, batch: int) -> Tree:
    kw = {}
    for f in dataclasses.fields(tf):
        v = getattr(tf, f.name)
        if f.name in _GAME_FIELDS:
            kw[f.name] = v
        elif f.name == "states":
            kw[f.name] = jax.tree_util.tree_map(
                lambda x: x.reshape((batch, -1) + x.shape[1:]), v)
        else:
            kw[f.name] = v.reshape((batch, -1) + v.shape[1:])
    return Tree(**kw)


def _select_flat(tf: Tree, cfg: SearchConfig, batch: int, cap: int):
    """Batched root->leaf PUCT walk on the flat tree.

    Returns ``(node, action, k_exit, path_n, path_k, root_a)``: the leaf's
    parent node, the chosen action, the parent's slot index when the walk
    ended on an EXISTING edge (depth cap re-expansion; -1 for a new edge),
    the visited chain ``path_n[B, D]`` (node ids, -1-padded;
    ``path_n[:, 0] == 0``), the slot chosen AT each chain node ``path_k``
    (-1 at the root), and the action taken at the root.  The chain is
    exactly the backup path, so insert can apply every level in one scatter
    instead of a per-level loop.
    """
    k = tf.slot_action.shape[1]
    base = jnp.arange(batch, dtype=jnp.int32) * cap
    acts = jnp.arange(A, dtype=jnp.int32)

    # --- root choice: full-width PUCT over the promoted root arrays ------
    n_tot0 = tf.node_n[base].astype(jnp.float32)                # [B]
    v00 = tf.value0[base]
    rp0 = tf.prior[base].astype(jnp.float32)                    # [B, A]
    cand0 = unpack_cand(tf.cand[base])
    en0 = tf.root_edge_n                                        # [B, A]
    q0 = jnp.where(en0 > 0, tf.root_edge_w / jnp.maximum(en0, 1),
                   v00[:, None])
    bonus0 = (cfg.uct_exp.at(n_tot0) * jnp.sqrt(1.0 + n_tot0))[:, None] \
        / (1.0 + en0.astype(jnp.float32))
    score0 = q0 + rp0 * bonus0
    score0 = jnp.where(cand0 & jnp.isfinite(score0), score0, -jnp.inf)
    root_a = jnp.where(jnp.any(cand0, axis=1),
                       jnp.argmax(score0, axis=1), A - 1).astype(jnp.int32)

    def puct_nonroot(m):
        """Slot-vs-unexpanded PUCT at non-root nodes m [B] -> (action, k).

        Expanded edges score from their slot stats.  Unexpanded candidates
        all share count 0, so their score ``fpu + prior * u`` is monotone
        in the prior — their argmax is the masked prior argmax, and only
        ONE [B, A] reduction is needed.
        """
        g = base + m
        n_tot = tf.node_n[g].astype(jnp.float32)
        fpu = jnp.maximum(tf.value0[g] - cfg.fpu_reduce.at(n_tot), 0.0)
        u = cfg.uct_exp.at(n_tot) * jnp.sqrt(1.0 + n_tot)       # [B]
        sa = tf.slot_action[g]                                  # [B, K]
        sn = tf.slot_n[g]
        occ = sa >= 0
        rowp = tf.prior[g].astype(jnp.float32)                  # [B, A]
        q_s = jnp.where(sn > 0, tf.slot_w[g] / jnp.maximum(sn, 1),
                        fpu[:, None])
        p_s = jnp.take_along_axis(rowp, jnp.maximum(sa, 0), axis=1)
        s_s = q_s + p_s * (u[:, None] / (1.0 + sn.astype(jnp.float32)))
        s_s = jnp.where(occ & jnp.isfinite(s_s), s_s, -jnp.inf)
        k_best = jnp.argmax(s_s, axis=1).astype(jnp.int32)
        s_best = jnp.max(s_s, axis=1)

        candm = unpack_cand(tf.cand[g])
        in_slots = jnp.any(sa[:, :, None] == acts[None, None, :], axis=1)
        un_mask = candm & ~in_slots
        p_un = jnp.where(un_mask, rowp, -jnp.inf)
        a_best = jnp.argmax(p_un, axis=1).astype(jnp.int32)
        su_best = fpu + jnp.max(p_un, axis=1) * u

        any_un = jnp.any(un_mask, axis=1)
        any_slot = jnp.any(occ, axis=1)
        slots_full = jnp.all(occ, axis=1)
        use_slot = any_slot & ((s_best >= su_best) | slots_full | ~any_un)
        action = jnp.where(
            use_slot, jnp.take_along_axis(sa, k_best[:, None], 1)[:, 0],
            jnp.where(any_un, a_best, A - 1))
        kk = jnp.where(use_slot, k_best, -1)
        return action, kk

    d = min(cap, MAX_BACKUP_DEPTH)
    path_n = jnp.full((batch, d), -1, jnp.int32).at[:, 0].set(0)
    path_k = jnp.full((batch, d), -1, jnp.int32)

    # resolve the root advance once, outside the loop: after it, a lane's
    # position is never the root again, so the loop body only consults the
    # slot tables
    child0 = jnp.take_along_axis(tf.root_child, root_a[:, None], 1)[:, 0]
    adv0 = child0 >= 0
    node1 = jnp.where(adv0, child0, 0)
    a1, k1 = puct_nonroot(node1)
    node = node1
    action = jnp.where(adv0, a1, root_a)
    kc = jnp.where(adv0, k1, -1)
    path_n = path_n.at[:, 1].set(jnp.where(adv0, node1, -1))
    path_k = path_k.at[:, 1].set(jnp.where(adv0, kc, -1))
    carry0 = (node, action, kc, ~adv0, jnp.int32(2), path_n, path_k)

    def cond(c):
        node, action, kc, done, depth, *_ = c
        return (~jnp.all(done)) & (depth < d)

    def body(c):
        node, action, kc, done, depth, path_n, path_k = c
        child = jnp.take_along_axis(
            tf.slot_child[base + node], jnp.maximum(kc, 0)[:, None],
            axis=1)[:, 0]
        child = jnp.where(kc >= 0, child, -1)
        adv = (~done) & (child >= 0)
        node2 = jnp.where(adv, child, node)
        action_new, k_new = puct_nonroot(node2)
        action2 = jnp.where(adv, action_new, action)
        k2 = jnp.where(adv, k_new, kc)
        # uniform write position: a lane advancing at iteration t has
        # advanced exactly t times (done is sticky), so this is a cheap
        # dynamic-update-slice, not a scatter
        path_n = jax.lax.dynamic_update_index_in_dim(
            path_n, jnp.where(adv, node2, -1), depth, axis=1)
        path_k = jax.lax.dynamic_update_index_in_dim(
            path_k, jnp.where(adv, k2, -1), depth, axis=1)
        return node2, action2, k2, done | (child < 0), depth + 1, \
            path_n, path_k

    node, action, k_exit, _, _, path_n, path_k = jax.lax.while_loop(
        cond, body, carry0)
    return node, action, k_exit, path_n, path_k, root_a


def _insert_backup_flat(tf: Tree, node, action, k_exit, path_n, path_k,
                        root_a, leaf_rows, value, policy, use_scoring,
                        enabled, candidate, batch: int, cap: int) -> Tree:
    """Batched insert+backup on the flat tree.

    Attach the evaluated leaf under ``(node, action)`` and back its value up
    the recorded chain.  Guarded writes are OOB-dropped unique-index
    scatters; the whole backup chain is applied in ONE scatter per
    statistic (every chain node is visited exactly once per simulation, so
    the per-node Welford updates are independent).  When the tree is full —
    or a non-root parent has no free child slot — the value still backs up
    but no node is inserted.  ``enabled=False`` (per-game rollout budget
    exhausted, `self_play.rs:232-241`) makes the whole call a no-op.
    ``candidate`` (fused path) supplies the kernel-computed mask instead of
    recomputing it from the leaf state here.
    """
    k = tf.slot_action.shape[1]
    base = jnp.arange(batch, dtype=jnp.int32) * cap
    oob = batch * cap + jnp.arange(batch, dtype=jnp.int32)  # unique, dropped
    acts = jnp.arange(A, dtype=jnp.int32)
    slots = jnp.arange(k, dtype=jnp.int32)
    has_room = tf.size < cap
    if enabled is not None:
        node = jnp.where(enabled, node, jnp.int32(-1))
    at_root = node == 0
    nonroot = node > 0

    # free slot in the parent: reuse the walk's slot on depth-cap
    # re-expansion, else the first empty
    sa_parent = tf.slot_action[jnp.where(nonroot, base + node, 0)]  # [B, K]
    first_free = jnp.argmax(sa_parent < 0, axis=1).astype(jnp.int32)
    free_k = jnp.where(k_exit >= 0, k_exit, first_free)
    slot_ok = (k_exit >= 0) | jnp.any(sa_parent < 0, axis=1)
    can = has_room & (at_root | (nonroot & slot_ok))

    new = jnp.minimum(tf.size, cap - 1)
    value = _sane_value(value)

    if candidate is None:
        cand_std = jax.vmap(standard_mask)(leaf_rows)
        if use_scoring is None:
            candidate = cand_std
        else:
            cand_scr = jax.vmap(scoring_mask)(leaf_rows)
            candidate = jnp.where(use_scoring[:, None], cand_scr, cand_std)
    prior = jax.vmap(_masked_prior)(policy, candidate)

    idx_new = jnp.where(can, base + new, oob)

    def setr(buf, row):
        return buf.at[idx_new].set(row, mode="drop", unique_indices=True)

    leaf_to_move = _states_to_move(leaf_rows).astype(jnp.int32)
    # NB: the new row's slot table needs no clearing — rows past ``size``
    # hold their init values within a search, and reroot's gather refills
    # every dead row (-1/0) before recycling
    tf = tf.replace(
        states=jax.tree_util.tree_map(setr, tf.states, leaf_rows),
        prior=setr(tf.prior, prior.astype(jnp.bfloat16)),
        cand=setr(tf.cand, pack_cand(candidate)),
        parent=setr(tf.parent, node),
        parent_action=setr(tf.parent_action, action),
        parent_slot=setr(tf.parent_slot,
                         jnp.where(at_root, -1, free_k)),
        node_to_move=setr(tf.node_to_move, leaf_to_move),
        value0=setr(tf.value0, value),
        size=tf.size + can.astype(jnp.int32),
    )

    # link the new edge.  Root: one-hot row rewrite of the [B, A] arrays.
    ok_root = can & at_root
    hot_new = (acts[None, :] == action[:, None]) & ok_root[:, None]
    root_child = jnp.where(hot_new, new[:, None], tf.root_child)
    # Non-root: read-modify-write the parent's slot row at unique row ids
    # (element-indexed 2D scatters make XLA:TPU retile the whole array
    # through a transposed flat view every sim).
    ok_slot = can & nonroot
    srow = jnp.where(ok_slot, base + jnp.maximum(node, 0), oob)
    khot = (slots[None, :] == free_k[:, None]) & ok_slot[:, None]  # [B, K]
    sa_row = jnp.where(khot, action[:, None], sa_parent)
    sc_row = jnp.where(khot, new[:, None],
                       tf.slot_child[jnp.where(ok_slot, base + node, 0)])
    tf = tf.replace(
        root_child=root_child,
        slot_action=tf.slot_action.at[srow].set(
            sa_row, mode="drop", unique_indices=True),
        slot_child=tf.slot_child.at[srow].set(
            sc_row, mode="drop", unique_indices=True),
    )

    # ---- whole-chain backup in one scatter per array --------------------
    valid = path_n >= 0                                     # [B, D]
    if enabled is not None:
        valid = valid & enabled[:, None]
    g = base[:, None] + jnp.maximum(path_n, 0)              # [B, D] global
    x = jnp.where(tf.node_to_move[g] == leaf_to_move[:, None],
                  value[:, None], 1.0 - value[:, None])     # [B, D]
    cnt = tf.node_n[g].astype(jnp.float32)
    wpre = tf.node_w[g]
    mean_prev = jnp.where(cnt > 0, wpre / jnp.maximum(cnt, 1.0), x)
    mean_next = (wpre + x) / (cnt + 1.0)

    d = path_n.shape[1]
    oob2 = (batch * cap
            + jnp.arange(batch * d, dtype=jnp.int32).reshape(batch, d))
    gmask = jnp.where(valid, g, oob2)
    node_m2 = tf.node_m2.at[gmask].add(
        (x - mean_prev) * (x - mean_next), mode="drop", unique_indices=True)
    node_n = tf.node_n.at[gmask].add(1, mode="drop", unique_indices=True)
    node_w = tf.node_w.at[gmask].add(x, mode="drop", unique_indices=True)
    # seed the new leaf's stats (chain excludes the leaf)
    node_n = node_n.at[idx_new].set(1, mode="drop", unique_indices=True)
    node_w = node_w.at[idx_new].set(value, mode="drop", unique_indices=True)

    # edge INTO chain node j accumulates the CHILD's value in the parent's
    # perspective (1 - x_j).  j = 1 is a root edge (action root_a); j >= 2
    # is the parent's slot path_k[j-1].  Root edges go in as one-hot [B, A]
    # adds; slot edges as one-hot [B, K] FULL ROWS at unique row indices
    # (the embedding-gradient scatter-add pattern) — 11x less scatter
    # traffic than the dense [B*(D-1), A] form.
    hot_r = ((acts[None, :] == root_a[:, None]) & valid[:, 1:2])
    hot_seed = (acts[None, :] == action[:, None]) & ok_root[:, None]
    root_edge_n = tf.root_edge_n + hot_r + hot_seed
    root_edge_w = tf.root_edge_w \
        + hot_r * (1.0 - x[:, 1:2]) + hot_seed * (1.0 - value)[:, None]

    evalid = valid[:, 2:]                                   # [B, D-2]
    erow = jnp.where(evalid,
                     base[:, None] + jnp.maximum(path_n[:, 1:-1], 0),
                     oob2[:, 2:]).reshape(-1)               # [B*(D-2)]
    khot_c = (slots[None, None, :] == path_k[:, 1:-1, None])  # [B, D-2, K]
    xk = x[:, 2:]
    slot_n = tf.slot_n.at[erow].add(
        khot_c.astype(jnp.int32).reshape(-1, k),
        mode="drop", unique_indices=True)
    slot_w = tf.slot_w.at[erow].add(
        (khot_c * (1.0 - xk)[:, :, None]).reshape(-1, k),
        mode="drop", unique_indices=True)
    # the leaf's own slot edge (parent `node`, slot free_k)
    khot_s = khot.astype(jnp.int32)
    slot_n = slot_n.at[srow].add(khot_s, mode="drop", unique_indices=True)
    slot_w = slot_w.at[srow].add(khot * (1.0 - value)[:, None],
                                 mode="drop", unique_indices=True)
    return tf.replace(node_n=node_n, node_w=node_w, node_m2=node_m2,
                      root_edge_n=root_edge_n, root_edge_w=root_edge_w,
                      slot_n=slot_n, slot_w=slot_w)


# ---------------------------------------------------------------------------
# batched search driver


def init_trees(states: GoState, predictor: Predictor, rng: jax.Array,
               cfg: SearchConfig, num_nodes: int,
               use_scoring: jax.Array | None) -> Tree:
    """Evaluate roots (batched) and allocate one tree per game."""
    feats = features.extract_batch(states, cfg.feature_set,
                                   cfg.ladder_features, cfg.feature_kernel,
                                   cfg.ladders_exact)
    value, policy = predictor(feats)
    cand_std = jax.vmap(standard_mask)(states)
    if use_scoring is None:
        candidate = cand_std
    else:
        cand_scr = jax.vmap(scoring_mask)(states)
        candidate = jnp.where(use_scoring[:, None], cand_scr, cand_std)
    batch = value.shape[0]
    rngs = jax.random.split(rng, batch)
    tree_states = pack_rows(states) if cfg.fused else states
    return jax.vmap(
        lambda s, v, p, c, r: init_tree(s, v, p, c, r, cfg, num_nodes)
    )(tree_states, value, policy, candidate, rngs)


def run_search(trees: Tree, predictor: Predictor, cfg: SearchConfig,
               num_sims: int, use_scoring: jax.Array,
               budget: jax.Array | None = None, start=0) -> Tree:
    """Run ``num_sims`` lockstep simulations across the whole game batch.

    ``budget`` (optional i32[B]) caps per-game simulations: game ``g`` stops
    contributing once ``start + i >= budget[g]`` (winrate-scaled rollouts,
    `self_play.rs:232-241`).  Lockstep means no compute is saved inside the
    loop, but result semantics match and the adaptive driver exits earlier.
    """

    batch = trees.size.shape[0]
    cap = trees.node_n.shape[1]
    base = jnp.arange(batch, dtype=jnp.int32) * cap

    def sim_step(i, tf):
        candidate = None
        node, action, k_exit, path_n, path_k, root_a = _select_flat(
            tf, cfg, batch, cap)
        parent = jax.tree_util.tree_map(lambda x: x[base + node], tf.states)
        if cfg.fused:
            from ..ops.leaf_step import leaf_step

            leaf_packed, feats_k, cand = leaf_step(
                *_widen_rows(parent), action, parent.komi)
            leaf_states = _narrow_rows(leaf_packed, parent.komi)
            b = cand.shape[0]
            feats = feats_k[:, :, :361].transpose(0, 2, 1) \
                .reshape(b, 19, 19, 32)
            if cfg.ladder_features:
                # one resolved reader for the whole search: the same flag
                # that chose the root's reader (init_trees -> extract_batch)
                # chooses the leaf's, so the net never sees planes 30/31
                # under two semantics within one search
                exact = features.resolve_ladders_exact(cfg.ladders_exact)
                if exact and jax.default_backend() == "tpu":
                    # leaf states are already kernel-packed: the exact
                    # Pallas ladder reads them in place (no unpack)
                    from ..ops.ladder_kernel import ladder_planes_kernel

                    capt, esc = ladder_planes_kernel(
                        leaf_packed[0], leaf_packed[1],
                        leaf_packed[4][:, 0, 0])
                else:
                    from ..go.ladder import ladder_planes_batch

                    unpacked = unpack_rows(leaf_states)
                    capt, esc = ladder_planes_batch(
                        unpacked, greedy=not exact)
                feats = feats.at[..., 30].set(
                    capt.astype(jnp.float32).reshape(b, 19, 19))
                feats = feats.at[..., 31].set(
                    esc.astype(jnp.float32).reshape(b, 19, 19))
            candidate = jnp.concatenate(
                [cand, jnp.ones((b, 1), bool)], axis=1)
            if use_scoring is not None:
                cand_scr = jax.vmap(scoring_mask)(unpack_rows(leaf_states))
                candidate = jnp.where(use_scoring[:, None], cand_scr,
                                      candidate)
        elif cfg.step_kernel:
            from ..ops.env_step import env_step

            onehot = (jnp.arange(engine.PASS)[None, :]
                      == action[:, None]).astype(jnp.float32)
            leaf_states, _ = env_step(parent, onehot, 0)
        else:
            leaf_states = jax.vmap(engine.step)(parent, action)
        if not cfg.fused:
            feats = features.extract_batch(
                leaf_states, cfg.feature_set, cfg.ladder_features,
                cfg.feature_kernel, cfg.ladders_exact)
        value, policy = predictor(feats)
        en = None if budget is None else (start + i) < budget
        return _insert_backup_flat(
            tf, node, action, k_exit, path_n, path_k, root_a, leaf_states,
            value, policy, use_scoring if candidate is None else None, en,
            candidate, batch, cap)

    tf = jax.lax.fori_loop(0, num_sims, sim_step, _flatten_trees(trees))
    return _unflatten_trees(tf, batch)


def search(states: GoState, predictor: Predictor, rng: jax.Array,
           cfg: SearchConfig, num_sims: int,
           use_scoring: jax.Array | None = None,
           capacity: int | None = None, adaptive: bool = False,
           budget: jax.Array | None = None) -> Tree:
    """Full search from a batch of root states; returns the trees.

    ``use_scoring`` is an optional bool[B] selecting the ScoringSearch
    candidate mask per game (None = StandardSearch everywhere, which skips
    the Benson computations entirely).  ``capacity`` > num_sims + 1 leaves
    head-room for subtree reuse via :func:`search_with_reuse`.
    """
    trees = init_trees(states, predictor, rng, cfg,
                       capacity or (num_sims + 1), use_scoring)
    if adaptive:
        return run_search_adaptive(trees, predictor, cfg, num_sims,
                                   use_scoring, budget=budget)
    return run_search(trees, predictor, cfg, num_sims, use_scoring,
                      budget=budget)


def search_done(tree: Tree, sims_remaining) -> jax.Array:
    """EARLY-C termination (`time_control/mod.rs:48-70`): the search is
    decided when the runner-up cannot catch the leader with the remaining
    simulation budget."""
    visits = root_visits(tree)
    best = jnp.max(visits)
    second = jnp.max(jnp.where(visits == best, -1, visits))
    return (best - jnp.maximum(second, 0)) > sims_remaining


UNSTABLE_MARGIN = 0.005


def search_unstable(tree: Tree) -> jax.Array:
    """UNST-N instability test (`time_control/byo_yomi.rs:177-192`
    ``is_stable``, negated): true when the most visited root child is not
    the highest-value child and the value gap exceeds 0.005.  Time-managed
    play extends the search while this holds."""
    visits = root_visits(tree)
    valid = visits > 0
    qv = jnp.where(valid, root_q(tree), -jnp.inf)
    top_visits = jnp.argmax(jnp.where(valid, visits, -1))
    top_value = jnp.argmax(qv)
    gap = qv[top_value] - qv[top_visits]
    return ((top_visits != top_value) & (gap >= UNSTABLE_MARGIN)
            & jnp.any(valid))


def run_search_adaptive(trees: Tree, predictor: Predictor, cfg: SearchConfig,
                        num_sims: int, use_scoring: jax.Array | None = None,
                        check_every: int = 32,
                        budget: jax.Array | None = None) -> Tree:
    """Chunked search that exits early once every game's result is decided.

    Lockstep note: per-game "done" cannot save work while other games
    continue; the win is the (common) case where the whole batch decides
    early — matching the practical effect of the reference's per-search
    EARLY-C stop.  A per-game ``budget`` (winrate-scaled rollouts) counts a
    game as done once its budget is spent, so lopsided batches exit sooner.
    """
    chunks = max(1, (num_sims + check_every - 1) // check_every)
    batch = trees.size.shape[0]
    if budget is None and num_sims % check_every != 0:
        # the final chunk would overshoot num_sims; the per-game budget
        # machinery caps it exactly
        budget = jnp.full((batch,), num_sims, jnp.int32)
    cap = jnp.int32(num_sims) if budget is None \
        else jnp.minimum(jnp.int32(num_sims), budget)

    def cond(carry):
        trees, i = carry
        remaining = jnp.broadcast_to(cap - i * check_every, (batch,))
        done = jax.vmap(search_done)(trees, remaining) | (remaining <= 0)
        return (i < chunks) & ~jnp.all(done)

    def body(carry):
        trees, i = carry
        trees = run_search(trees, predictor, cfg, check_every, use_scoring,
                           budget=budget, start=i * check_every)
        return trees, i + 1

    trees, _ = jax.lax.while_loop(cond, body, (trees, jnp.int32(0)))
    return trees


# ---------------------------------------------------------------------------
# subtree reuse (`tree.rs:1225-1249` Node::forward)


def _descendant_mask(parent: jax.Array, c: jax.Array) -> jax.Array:
    """bool[N]: nodes in the subtree rooted at ``c`` (pointer doubling)."""
    n = parent.shape[0]
    desc = jnp.arange(n) == c
    hop = parent
    steps = max(1, (n - 1).bit_length())
    for _ in range(steps):
        desc = desc | ((hop >= 0) & desc[jnp.maximum(hop, 0)])
        hop = jnp.where(hop >= 0, hop[jnp.maximum(hop, 0)], -1)
    return desc


def reroot(tree: Tree, action: jax.Array, noise_rng: jax.Array,
           cfg: SearchConfig):
    """Compact the subtree under root-child ``action`` to the front.

    Returns ``(tree, valid)``; when the played move was never expanded
    (``valid`` False) the caller must fall back to a fresh tree.  The new
    root keeps its accumulated statistics, gets fresh Dirichlet noise
    (`lib.rs:162-165` re-noises the reused root every move), and its sparse
    child slots are densified into the full-width root arrays — its full
    prior row was stored at expansion, so no information is lost
    ("promotion", `tree.rs:958-991`).
    """
    n = tree.node_n.shape[0]
    c = tree.root_child[action]
    valid = (c >= 0) & (tree.size > 1)
    c0 = jnp.maximum(c, 0)

    desc = _descendant_mask(tree.parent, c0)
    # order: new root first, then remaining subtree nodes by old index
    key = jnp.where(desc, jnp.arange(n) + 1, n + 2)
    key = jnp.where(jnp.arange(n) == c0, 0, key)
    order = jnp.argsort(key)                      # [N] gather map new->old
    sorted_key = jnp.sort(key)
    new_idx = jnp.searchsorted(sorted_key, key)   # [N] old->new
    k = jnp.sum(desc).astype(jnp.int32)
    live = jnp.arange(n) < k                      # valid new rows

    def gather(buf, fill=None):
        out = buf[order]
        if fill is not None:
            mask = live.reshape((n,) + (1,) * (out.ndim - 1))
            out = jnp.where(mask, out, jnp.asarray(fill, out.dtype))
        return out

    slot_action = gather(tree.slot_action, -1)
    slot_child = gather(tree.slot_child)
    slot_child = jnp.where((slot_child >= 0) & live[:, None],
                           new_idx[jnp.maximum(slot_child, 0)], -1)
    slot_n = gather(tree.slot_n, 0)
    slot_w = gather(tree.slot_w, 0.0)
    parent = jnp.where(live, new_idx[jnp.maximum(gather(tree.parent), 0)], -1)
    parent = parent.at[0].set(-1)

    prior = gather(tree.prior, 0.0)
    cand = gather(tree.cand, 0)

    # densify the new root's slots into the full-width root arrays
    sa0, sc0 = slot_action[0], slot_child[0]
    sn0, sw0 = slot_n[0], slot_w[0]
    idx0 = jnp.where(sa0 >= 0, sa0, A)            # empties -> pad slot
    root_child = jnp.full((A + 1,), -1, jnp.int32).at[idx0].set(sc0)[:A]
    root_edge_n = jnp.zeros((A + 1,), jnp.int32).at[idx0].set(sn0)[:A]
    root_edge_w = jnp.zeros((A + 1,)).at[idx0].set(sw0)[:A]
    # the root never reads its own slot row; clear it for introspection
    slot_action = slot_action.at[0].set(-1)
    slot_child = slot_child.at[0].set(-1)
    slot_n = slot_n.at[0].set(0)
    slot_w = slot_w.at[0].set(0.0)

    cand0 = unpack_cand(cand[0])
    root_prior = _masked_prior(prior[0].astype(jnp.float32), cand0)
    if cfg.dirichlet_noise > 0:
        root_prior = _dirichlet_mix(noise_rng, root_prior, cand0,
                                    cfg.dirichlet_noise, cfg.dirichlet_alpha)
    prior = prior.at[0].set(root_prior.astype(jnp.bfloat16))

    out = Tree(
        states=jax.tree_util.tree_map(lambda b: b[order], tree.states),
        prior=prior,
        cand=cand,
        root_child=root_child,
        root_edge_n=root_edge_n,
        root_edge_w=root_edge_w,
        slot_action=slot_action,
        slot_child=slot_child,
        slot_n=slot_n,
        slot_w=slot_w,
        parent=parent,
        parent_action=gather(tree.parent_action, 0),
        parent_slot=gather(tree.parent_slot, -1).at[0].set(-1),
        node_n=gather(tree.node_n, 0),
        node_w=gather(tree.node_w, 0.0),
        node_m2=gather(tree.node_m2, 0.0),
        node_to_move=gather(tree.node_to_move, 0),
        value0=gather(tree.value0, 0.0),
        size=jnp.maximum(k, 1),
    )
    return out, valid


def search_with_reuse(states: GoState, prev_trees: Tree,
                      prev_actions: jax.Array, predictor: Predictor,
                      rng: jax.Array, cfg: SearchConfig, num_sims: int,
                      use_scoring: jax.Array | None = None,
                      budget: jax.Array | None = None,
                      fresh_mask: jax.Array | None = None,
                      adaptive: bool = False) -> Tree:
    """Search reusing each game's subtree under the move just played.

    With ``cfg.reuse_budget`` (default, reference `rollout_limit.rs:18-45`
    semantics) the reused subtree's visits count toward the per-move
    budget, so the search TOPS UP to ``num_sims`` total root visits — a
    tree of capacity ``num_sims + 8`` then always suffices, because a
    subtree's node count never exceeds its root's visit count.
    ``fresh_mask`` (bool[B]) forces a fresh tree for slots whose game was
    just replaced (continuous self-play batching) — their previous tree
    belongs to a different game.  ``adaptive`` routes through the chunked
    EARLY-C loop (`run_search_adaptive`) so a batch whose budgets are all
    spent — or whose searches are all decided — exits before ``num_sims``
    trip counts, exactly as the first (fresh-tree) move does.
    """
    batch = states.stones.shape[0]
    k_fresh, k_noise = jax.random.split(rng)
    capacity = prev_trees.node_n.shape[-1]  # [batch, N] -> N
    fresh = init_trees(states, predictor, k_fresh, cfg, capacity, use_scoring)
    reused, valid = jax.vmap(
        lambda t, a, r: reroot(t, a, r, cfg)
    )(prev_trees, prev_actions, jax.random.split(k_noise, batch))
    if fresh_mask is not None:
        valid = valid & ~fresh_mask

    def pick(a, b):
        v = valid.reshape((batch,) + (1,) * (a.ndim - 1))
        return jnp.where(v, a, b)

    trees = jax.tree_util.tree_map(pick, reused, fresh)
    if cfg.reuse_budget:
        prev_n = jnp.maximum(trees.node_n[:, 0] - 1, 0)
        base_budget = jnp.full((batch,), num_sims, jnp.int32) \
            if budget is None else budget
        budget = jnp.maximum(base_budget - prev_n, 0)
    if adaptive:
        return run_search_adaptive(trees, predictor, cfg, num_sims,
                                   use_scoring, budget=budget)
    return run_search(trees, predictor, cfg, num_sims, use_scoring,
                      budget=budget)


# ---------------------------------------------------------------------------
# move selection and targets (per game; vmap for batches)


def root_visits(tree: Tree) -> jax.Array:
    """i32[362] visit counts of the root's children."""
    return tree.root_edge_n


def root_q(tree: Tree) -> jax.Array:
    """f32[362] mean value of each root edge, root-perspective win rate."""
    return jnp.where(tree.root_edge_n > 0,
                     tree.root_edge_w / jnp.maximum(tree.root_edge_n, 1),
                     tree.value0[0])


def softmax_targets(tree: Tree) -> jax.Array:
    """Normalized visit distribution (`tree.rs:1293-1306` softmax)."""
    visits = root_visits(tree).astype(jnp.float32)
    return visits / jnp.maximum(jnp.sum(visits), 1.0)


def best_move(tree: Tree, rng: jax.Array, cfg: SearchConfig,
              temperature: jax.Array):
    """(action, value) — `tree.rs:1262-1282` best().

    ``temperature`` <= 0.09 means greedy LCB selection; otherwise the move is
    drawn by percentile-cutoff temperature sampling over visit counts.
    """
    visits = root_visits(tree)
    child = tree.root_child
    q = root_q(tree)

    count = visits.astype(jnp.float32)
    std = jnp.sqrt(tree.node_m2[jnp.maximum(child, 0)]
                   / jnp.maximum(count, 1.0))
    z = cfg.critical_value.at(tree.node_n[0].astype(jnp.float32))
    lcb = normal_lcb(q, std, jnp.maximum(visits, 1), z)

    eligible = visits >= MIN_LCB_VISITS
    # greedy: LCB among eligible children if any, else count with prior ties
    greedy_score = jnp.where(
        jnp.any(eligible),
        jnp.where(eligible, lcb, -jnp.inf),
        count + 1e-3 * tree.prior[0].astype(jnp.float32))
    greedy_score = jnp.where(visits > 0, greedy_score, -jnp.inf)
    any_visit = jnp.any(visits > 0)
    greedy_action = jnp.where(any_visit, jnp.argmax(greedy_score), A - 1)

    sampled_action = choose(rng, count[None, :], cfg.cutoff_percentile,
                            float(cfg.temperature))[0]
    action = jnp.where(temperature <= 9e-2, greedy_action, sampled_action)
    value = q[action]
    return action.astype(jnp.int32), value
