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

import functools

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


class Tree(struct.PyTreeNode):
    """Fixed-capacity array tree for one game (batch via vmap).

    Node 0 is the root; new nodes are appended at index ``size``.
    """

    states: GoState          # stacked [N] board state per node
    prior: jax.Array         # f32[N, 362] masked+renormalized priors
    candidate: jax.Array     # bool[N, 362] policy-checker mask
    children: jax.Array      # i32[N, 362], -1 = absent
    parent: jax.Array        # i32[N], -1 for root
    parent_action: jax.Array  # i32[N]
    node_n: jax.Array        # i32[N] visit count
    node_w: jax.Array        # f32[N] value sum (node-to-move perspective)
    node_m2: jax.Array       # f32[N] Welford sum of squared deviations
    value0: jax.Array        # f32[N] net value at node (initial_value)
    edge_n: jax.Array        # i32[N, 362] per-edge visits (SoA like
    edge_w: jax.Array        # f32[N, 362] BigChildrenImpl, tree.rs:547-568):
    #                          edge_w/edge_n is the edge Q in the PARENT's
    #                          perspective, so select touches only rows of
    #                          the current node — no [B,A]-indexed gathers
    #                          from [B,N] child stats on the hot path
    node_to_move: jax.Array  # i32[N] to-move at each node (compact copy of
    #                          the state row, so backup's perspective flips
    #                          gather one scalar, not a packed-state row)
    size: jax.Array          # i32 allocated nodes


def _node_mean(tree: Tree, idx) -> jax.Array:
    return tree.node_w[idx] / jnp.maximum(tree.node_n[idx], 1)


def init_tree(state: GoState, value: jax.Array, policy: jax.Array,
              candidate: jax.Array, noise_rng: jax.Array | None,
              cfg: SearchConfig, num_nodes: int) -> Tree:
    """Allocate a tree and install the evaluated root."""
    n = num_nodes
    states = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), state)
    prior = _masked_prior(policy, candidate)
    if noise_rng is not None and cfg.dirichlet_noise > 0:
        prior = _dirichlet_mix(noise_rng, prior, candidate,
                               cfg.dirichlet_noise, cfg.dirichlet_alpha)
    tree = Tree(
        states=states,
        prior=jnp.zeros((n, A)).at[0].set(prior),
        candidate=jnp.zeros((n, A), bool).at[0].set(candidate),
        children=jnp.full((n, A), -1, jnp.int32),
        parent=jnp.full((n,), -1, jnp.int32),
        parent_action=jnp.zeros((n,), jnp.int32),
        node_n=jnp.zeros((n,), jnp.int32).at[0].set(1),
        node_w=jnp.zeros((n,)).at[0].set(_sane_value(value)),
        node_m2=jnp.zeros((n,)),
        value0=jnp.zeros((n,)).at[0].set(_sane_value(value)),
        edge_n=jnp.zeros((n, A), jnp.int32),
        edge_w=jnp.zeros((n, A)),
        node_to_move=jnp.broadcast_to(
            _states_to_move(state).astype(jnp.int32), (n,)),
        size=jnp.int32(1),
    )
    return tree


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


# ---------------------------------------------------------------------------
# one simulation = select -> step+features (vmapped), net (batched),
#                  insert+backup (vmapped)


def _select(tree: Tree, cfg: SearchConfig):
    """Walk root->leaf by PUCT; returns (leaf_node, action)."""

    def puct(node):
        # row reads only: per-edge stats replace child gathers (SoA edges,
        # tree.rs:547-568); edge_n > 0 iff the child node exists
        edge_n = tree.edge_n[node]                        # [A]
        q_visited = tree.edge_w[node] / jnp.maximum(edge_n, 1)
        n_tot = tree.node_n[node].astype(jnp.float32)
        fpu = jnp.where(node == 0, tree.value0[node],
                        jnp.maximum(tree.value0[node]
                                    - cfg.fpu_reduce.at(n_tot), 0.0))
        q = jnp.where(edge_n > 0, q_visited, fpu)
        bonus = cfg.uct_exp.at(n_tot) * jnp.sqrt(1.0 + n_tot) \
            / (1.0 + edge_n.astype(jnp.float32))
        score = q + tree.prior[node] * bonus
        score = jnp.where(tree.candidate[node] & jnp.isfinite(score),
                          score, -jnp.inf)
        any_cand = jnp.any(tree.candidate[node])
        action = jnp.where(any_cand, jnp.argmax(score), A - 1)
        return action

    def cond(carry):
        node, action, depth = carry
        child = tree.children[node, action]
        return (child >= 0) & (depth < tree.node_n.shape[0])

    def body(carry):
        node, action, depth = carry
        child = tree.children[node, action]
        return child, puct(child), depth + 1

    node0 = jnp.int32(0)
    carry = (node0, puct(node0), jnp.int32(0))
    node, action, _ = jax.lax.while_loop(cond, body, carry)
    return node, action


def _leaf(tree: Tree, cfg: SearchConfig):
    """Select + env-step for one game (features are batched separately)."""
    node, action = _select(tree, cfg)
    parent_state = jax.tree_util.tree_map(lambda x: x[node], tree.states)
    leaf_state = engine.step(parent_state, action)
    return node, action, leaf_state


def _leaf_select(tree: Tree, cfg: SearchConfig):
    """Select only; the env step runs batched (Pallas kernel path)."""
    node, action = _select(tree, cfg)
    parent_state = jax.tree_util.tree_map(lambda x: x[node], tree.states)
    return node, action, parent_state


def _insert_backup(tree: Tree, node, action, leaf_state,
                   value, policy, use_scoring, enabled=None,
                   candidate=None) -> Tree:
    """Attach the evaluated leaf and back its value up to the root.

    When the tree is full (possible after subtree reuse), the value is still
    backed up but no node is inserted.  ``enabled=False`` (per-game rollout
    budget exhausted, `self_play.rs:232-241`) makes the whole call a no-op.
    ``candidate`` (fused path) supplies the kernel-computed mask instead of
    recomputing it from the leaf state here.
    """
    capacity = tree.node_n.shape[0]
    has_room = tree.size < capacity
    if enabled is not None:
        has_room = has_room & enabled
        node = jnp.where(enabled, node, jnp.int32(-1))
    new = jnp.minimum(tree.size, capacity - 1)
    value = _sane_value(value)

    if candidate is None:
        cand_std = standard_mask(leaf_state)
        if use_scoring is None:  # static fast path: StandardSearch everywhere
            candidate = cand_std
        else:
            cand_scr = scoring_mask(leaf_state)
            candidate = jnp.where(use_scoring, cand_scr, cand_std)
    prior = _masked_prior(policy, candidate)

    def set_row(buf, row):
        return jnp.where(has_room, buf.at[new].set(row), buf)

    states = jax.tree_util.tree_map(
        lambda buf, leaf: set_row(buf, leaf), tree.states, leaf_state)
    tree = tree.replace(
        states=states,
        prior=set_row(tree.prior, prior),
        candidate=set_row(tree.candidate, candidate),
        children=jnp.where(has_room,
                           tree.children.at[node, action].set(new),
                           tree.children),
        parent=set_row(tree.parent, node),
        parent_action=set_row(tree.parent_action, action),
        size=tree.size + has_room.astype(jnp.int32),
        value0=set_row(tree.value0, value),
        node_to_move=set_row(tree.node_to_move,
                             _states_to_move(leaf_state).astype(jnp.int32)),
    )

    # backup from leaf to root with perspective flips (tree.rs:125-159);
    # per-edge stats accumulate 1 - x_child = the value in the PARENT's
    # perspective, so edge_w/edge_n reproduces select's old q_visited
    leaf_to_move = _states_to_move(leaf_state)

    def cond(carry):
        n, *_ = carry
        return n >= 0

    def body(carry):
        n, node_n, node_w, node_m2, edge_n, edge_w = carry
        x = jnp.where(_states_to_move(tree.states, n) == leaf_to_move,
                      value, 1.0 - value)
        cnt = node_n[n].astype(jnp.float32)
        mean_prev = jnp.where(cnt > 0, node_w[n] / jnp.maximum(cnt, 1.0), x)
        mean_next = (node_w[n] + x) / (cnt + 1.0)
        node_m2 = node_m2.at[n].add((x - mean_prev) * (x - mean_next))
        node_n = node_n.at[n].add(1)
        node_w = node_w.at[n].add(x)
        # the edge INTO n (skip at the root, whose parent is -1)
        par = tree.parent[n]
        pc = jnp.maximum(par, 0)
        on = (par >= 0).astype(jnp.int32)
        edge_n = edge_n.at[pc, tree.parent_action[n]].add(on)
        edge_w = edge_w.at[pc, tree.parent_action[n]].add(
            on.astype(jnp.float32) * (1.0 - x))
        return par, node_n, node_w, node_m2, edge_n, edge_w

    # seed the new leaf's stats and its edge, then walk up from its parent
    node_n = jnp.where(has_room, tree.node_n.at[new].set(1), tree.node_n)
    node_w = jnp.where(has_room, tree.node_w.at[new].set(value), tree.node_w)
    seed = has_room.astype(jnp.int32)
    nc = jnp.maximum(node, 0)
    edge_n = tree.edge_n.at[nc, action].add(
        seed * (node >= 0).astype(jnp.int32))
    edge_w = tree.edge_w.at[nc, action].add(
        jnp.where(has_room & (node >= 0), 1.0 - value, 0.0))
    _, node_n, node_w, node_m2, edge_n, edge_w = jax.lax.while_loop(
        cond, body, (node, node_n, node_w, tree.node_m2, edge_n, edge_w))
    return tree.replace(node_n=node_n, node_w=node_w, node_m2=node_m2,
                        edge_n=edge_n, edge_w=edge_w)


# ---------------------------------------------------------------------------
# flat-tree hot path
#
# The vmapped row ops above are the readable reference; the simulation loop
# itself runs on a FLATTENED tree ([B, C, ...] leaves viewed as [B*C, ...])
# with explicit global row ids.  Per-lane indexing under vmap lowers on TPU
# to masked whole-array selects (a full [B, C, 362] rewrite per update, the
# dominant cost of a simulation); plain row gathers and unique-index row
# scatters on the flat view lower to the efficient dynamic-slice paths.


def _flatten_trees(trees: Tree) -> Tree:
    """[B, C, ...] leaves -> [B*C, ...] views (free reshape; size stays [B])."""
    return jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[2:]) if x.ndim >= 2 else x,
        trees)


def _unflatten_trees(trees_flat: Tree, batch: int) -> Tree:
    return jax.tree_util.tree_map(
        lambda x: x if x.shape[0] == batch
        else x.reshape((batch, -1) + x.shape[1:]), trees_flat)


def _select_flat(tf: Tree, cfg: SearchConfig, batch: int, cap: int):
    """Batched root->leaf PUCT walk on the flat tree.

    Returns ``(node, action, path_n, path_a)``: the leaf's parent and the
    chosen action, plus the visited chain ``path_n[B, cap]`` (node ids,
    -1-padded; ``path_n[:, 0] == 0``) and the action taken at each chain
    node ``path_a``.  The chain is exactly the backup path, so insert can
    apply every level in one scatter instead of a per-level loop.
    """
    base = jnp.arange(batch, dtype=jnp.int32) * cap

    def puct(node):
        gid = base + node
        edge_n = tf.edge_n[gid]                               # [B, A]
        q_visited = tf.edge_w[gid] / jnp.maximum(edge_n, 1)
        n_tot = tf.node_n[gid].astype(jnp.float32)            # [B]
        v0 = tf.value0[gid]
        fpu = jnp.where(node == 0, v0,
                        jnp.maximum(v0 - cfg.fpu_reduce.at(n_tot), 0.0))
        q = jnp.where(edge_n > 0, q_visited, fpu[:, None])
        bonus = (cfg.uct_exp.at(n_tot) * jnp.sqrt(1.0 + n_tot))[:, None] \
            / (1.0 + edge_n.astype(jnp.float32))
        cand = tf.candidate[gid]
        score = q + tf.prior[gid] * bonus
        score = jnp.where(cand & jnp.isfinite(score), score, -jnp.inf)
        any_cand = jnp.any(cand, axis=1)
        return jnp.where(any_cand, jnp.argmax(score, axis=1),
                         A - 1).astype(jnp.int32)

    d = min(cap, MAX_BACKUP_DEPTH)
    node0 = jnp.zeros((batch,), jnp.int32)
    action0 = puct(node0)
    path_n = jnp.full((batch, d), -1, jnp.int32).at[:, 0].set(0)
    path_a = jnp.zeros((batch, d), jnp.int32).at[:, 0].set(action0)
    carry0 = (node0, action0, jnp.zeros((batch,), bool), jnp.int32(1),
              path_n, path_a)

    def cond(c):
        node, action, done, depth, *_ = c
        return (~jnp.all(done)) & (depth < d)

    def body(c):
        node, action, done, depth, path_n, path_a = c
        # row gather + take: a paired-index gather here makes XLA keep a
        # TRANSPOSED copy of `children` alive across the loop
        child = jnp.take_along_axis(
            tf.children[base + node], action[:, None], axis=1)[:, 0]
        adv = (~done) & (child >= 0)
        node2 = jnp.where(adv, child, node)
        action2 = jnp.where(adv, puct(node2), action)
        # uniform write position: a lane advancing at iteration t has
        # advanced exactly t times (done is sticky), so this is a cheap
        # dynamic-update-slice, not a scatter
        path_n = jax.lax.dynamic_update_index_in_dim(
            path_n, jnp.where(adv, node2, -1), depth, axis=1)
        path_a = jax.lax.dynamic_update_index_in_dim(
            path_a, jnp.where(adv, action2, 0), depth, axis=1)
        return node2, action2, done | (child < 0), depth + 1, path_n, path_a

    node, action, _, _, path_n, path_a = jax.lax.while_loop(
        cond, body, carry0)
    return node, action, path_n, path_a


def _insert_backup_flat(tf: Tree, node, action, path_n, path_a, leaf_rows,
                        value, policy, use_scoring, enabled, candidate,
                        batch: int, cap: int) -> Tree:
    """Batched insert+backup on the flat tree (same semantics as
    :func:`_insert_backup`).

    Guarded writes become OOB-dropped unique-index scatters, and the whole
    backup chain (supplied by select as ``path_n``/``path_a``) is applied
    in ONE scatter per statistic: every chain node is visited exactly once
    per simulation, so the per-node Welford updates are independent and
    need no sequential loop.
    """
    base = jnp.arange(batch, dtype=jnp.int32) * cap
    oob = batch * cap + jnp.arange(batch, dtype=jnp.int32)  # unique, dropped
    has_room = tf.size < cap
    if enabled is not None:
        has_room = has_room & enabled
        node = jnp.where(enabled, node, jnp.int32(-1))
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

    idx_new = jnp.where(has_room, base + new, oob)

    def setr(buf, row):
        return buf.at[idx_new].set(row, mode="drop", unique_indices=True)

    ok_child = has_room & (node >= 0)
    child_row = jnp.where(ok_child, base + jnp.maximum(node, 0), oob)
    # children[node, action] = new as a row read-modify-write: an element-
    # indexed 2D scatter makes XLA:TPU retile the array through a
    # transposed flat view every sim
    crow = tf.children[jnp.where(ok_child, child_row, 0)]
    crow = jnp.where(jnp.arange(A, dtype=jnp.int32)[None, :]
                     == action[:, None], new[:, None], crow)
    tf = tf.replace(
        states=jax.tree_util.tree_map(setr, tf.states, leaf_rows),
        prior=setr(tf.prior, prior),
        candidate=setr(tf.candidate, candidate),
        children=tf.children.at[child_row].set(
            crow, mode="drop", unique_indices=True),
        parent=setr(tf.parent, node),
        parent_action=setr(tf.parent_action, action),
        size=tf.size + has_room.astype(jnp.int32),
        value0=setr(tf.value0, value),
    )

    leaf_to_move = _states_to_move(leaf_rows).astype(jnp.int32)
    tf = tf.replace(node_to_move=setr(tf.node_to_move, leaf_to_move))

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

    # edge INTO chain node k is (path_n[k-1], path_a[k-1]) and accumulates
    # the CHILD's value in the parent's perspective (1 - x_k).  Updates go
    # in as ONE-HOT FULL ROWS at unique row indices (the embedding-gradient
    # scatter-add pattern): element-indexed 2D scatters made XLA:TPU retile
    # the whole [B*C, A] arrays through a transposed flat view every sim.
    evalid = valid[:, 1:]
    erow = jnp.where(evalid,
                     base[:, None] + jnp.maximum(path_n[:, :-1], 0),
                     oob2[:, 1:]).reshape(-1)                # [B*(D-1)]
    hot = (jnp.arange(A, dtype=jnp.int32)[None, None, :]
           == path_a[:, :-1, None])                          # [B, D-1, A]
    xk = x[:, 1:]
    edge_n = tf.edge_n.at[erow].add(
        hot.astype(jnp.int32).reshape(-1, A),
        mode="drop", unique_indices=True)
    edge_w = tf.edge_w.at[erow].add(
        (hot * (1.0 - xk)[:, :, None]).reshape(-1, A),
        mode="drop", unique_indices=True)
    # the leaf's own edge (node, action), same full-row form
    seed_hot = jnp.arange(A, dtype=jnp.int32)[None, :] == action[:, None]
    edge_n = edge_n.at[child_row].add(
        seed_hot.astype(jnp.int32), mode="drop", unique_indices=True)
    edge_w = edge_w.at[child_row].add(
        seed_hot * (1.0 - value)[:, None],
        mode="drop", unique_indices=True)
    return tf.replace(node_n=node_n, node_w=node_w, node_m2=node_m2,
                      edge_n=edge_n, edge_w=edge_w)


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
        node, action, path_n, path_a = _select_flat(tf, cfg, batch, cap)
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
            tf, node, action, path_n, path_a, leaf_states, value, policy,
            use_scoring if candidate is None else None, en, candidate,
            batch, cap)

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
    batch = trees.node_n.shape[0]
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
    root keeps its accumulated statistics and gets fresh Dirichlet noise
    (`lib.rs:162-165` re-noises the reused root every move).
    """
    n = tree.node_n.shape[0]
    c = tree.children[0, action]
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
            out = jnp.where(mask, out, fill)
        return out

    children = gather(tree.children)
    children = jnp.where((children >= 0) & live[:, None],
                         new_idx[jnp.maximum(children, 0)], -1)
    parent = jnp.where(live, new_idx[jnp.maximum(gather(tree.parent), 0)], -1)
    parent = parent.at[0].set(-1)

    prior = gather(tree.prior, 0.0)
    candidate = gather(tree.candidate, False)
    root_prior = _masked_prior(prior[0], candidate[0])
    if cfg.dirichlet_noise > 0:
        root_prior = _dirichlet_mix(noise_rng, root_prior, candidate[0],
                                    cfg.dirichlet_noise, cfg.dirichlet_alpha)
    prior = prior.at[0].set(root_prior)

    out = Tree(
        states=jax.tree_util.tree_map(lambda b: b[order], tree.states),
        prior=prior,
        candidate=candidate,
        children=children,
        parent=parent,
        parent_action=gather(tree.parent_action, 0),
        node_n=gather(tree.node_n, 0),
        node_w=gather(tree.node_w, 0.0),
        node_m2=gather(tree.node_m2, 0.0),
        value0=gather(tree.value0, 0.0),
        edge_n=gather(tree.edge_n, 0),
        edge_w=gather(tree.edge_w, 0.0),
        node_to_move=gather(tree.node_to_move, 0),
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

    ``prev_trees`` must have capacity >= num_sims + largest reused subtree;
    allocate with ``search(..., capacity=2*num_sims)`` style via init_trees.
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
    if adaptive:
        return run_search_adaptive(trees, predictor, cfg, num_sims,
                                   use_scoring, budget=budget)
    return run_search(trees, predictor, cfg, num_sims, use_scoring,
                      budget=budget)


# ---------------------------------------------------------------------------
# move selection and targets (per game; vmap for batches)


def root_visits(tree: Tree) -> jax.Array:
    """i32[362] visit counts of the root's children."""
    return tree.edge_n[0]


def root_q(tree: Tree) -> jax.Array:
    """f32[362] mean value of each root edge, root-perspective win rate."""
    return jnp.where(tree.edge_n[0] > 0,
                     tree.edge_w[0] / jnp.maximum(tree.edge_n[0], 1),
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
    child = tree.children[0]
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
        count + 1e-3 * tree.prior[0])
    greedy_score = jnp.where(visits > 0, greedy_score, -jnp.inf)
    any_visit = jnp.any(visits > 0)
    greedy_action = jnp.where(any_visit, jnp.argmax(greedy_score), A - 1)

    sampled_action = choose(rng, count[None, :], cfg.cutoff_percentile,
                            float(cfg.temperature))[0]
    action = jnp.where(temperature <= 9e-2, greedy_action, sampled_action)
    value = q[action]
    return action.astype(jnp.int32), value
