"""Search-tree introspection: pretty dumps and SGF export.

Replaces the reference's tree dumps: the stderr candidate summary used by
``gomill-explain_last_move`` / verbose genmove (`tree.rs:1683-1731`
``to_pretty``) and the ``trace-mcts`` feature that emits the whole search
tree as an SGF variation tree after every move (`lib.rs:196-198`,
`tree.rs:1147-1216` ``as_sgf``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils import coords
from ..utils.lcb import normal_lcb
from . import search as S


def _tree_np(tree):
    """Pull one game's tree to host numpy (tree must be unbatched).

    The device tree stores edges two-tier (full-width root + sparse child
    slots, `search.Tree`); introspection densifies them back to one
    ``children[N, A]`` table.
    """
    if isinstance(tree.states, S.PackedStates):
        to_move = np.asarray(tree.states.meta[:, 0]).astype(np.int8)
    else:
        to_move = np.asarray(tree.states.to_move)
    n = tree.node_n.shape[0]
    children = np.full((n, S.A), -1, np.int32)
    sa = np.asarray(tree.slot_action)
    sc = np.asarray(tree.slot_child)
    rows = np.repeat(np.arange(n), sa.shape[1])
    occ = sa.ravel() >= 0
    children[rows[occ], sa.ravel()[occ]] = sc.ravel()[occ]
    children[0] = np.asarray(tree.root_child)
    return dict(
        children=children,
        parent=np.asarray(tree.parent),
        node_n=np.asarray(tree.node_n),
        node_w=np.asarray(tree.node_w),
        node_m2=np.asarray(tree.node_m2),
        prior=np.asarray(tree.prior.astype(jnp.float32)),
        size=int(np.asarray(tree.size)),
        to_move=to_move,
    )


def _greedy_path(t, node, min_count=1, limit=12):
    path = []
    while len(path) < limit:
        children = t["children"][node]
        counts = np.where(children >= 0,
                          t["node_n"][np.maximum(children, 0)], 0)
        best = int(counts.argmax())
        if counts[best] < min_count:
            break
        path.append(best)
        node = int(children[best])
    return path


def to_pretty(tree, max_children: int = 10) -> str:
    """Human-readable root summary (`tree.rs:1683-1731`).

    One line per candidate: visits, mean win rate, LCB, prior, and the
    principal variation.
    """
    t = _tree_np(tree)
    root_n = int(t["node_n"][0])
    children = t["children"][0]
    counts = np.where(children >= 0, t["node_n"][np.maximum(children, 0)], 0)
    means = np.where(
        children >= 0,
        1.0 - t["node_w"][np.maximum(children, 0)]
        / np.maximum(t["node_n"][np.maximum(children, 0)], 1), 0.0)
    win = float((counts * means).sum() / max(root_n, 1))
    pv = " ".join(coords.to_gtp(i) for i in _greedy_path(t, 0))
    lines = [f"Nodes: {root_n}, Win: {100.0 * win:.1f}%, PV: {pv}"]

    order = np.argsort(-counts)[:max_children]
    for i in order:
        if counts[i] == 0:
            continue
        c = int(children[i])
        std = np.sqrt(t["node_m2"][c] / max(counts[i], 1))
        lcb = float(normal_lcb(means[i], std, max(int(counts[i]), 1), 1.0))
        sub_pv = " ".join(coords.to_gtp(j)
                          for j in _greedy_path(t, c))
        lines.append(
            f"{coords.to_gtp(int(i)):>5} -> {int(counts[i]):7d} "
            f"(W: {100.0 * means[i]:5.2f}% / {100.0 * lcb:5.2f}%) "
            f"(N: {100.0 * t['prior'][0][i]:5.2f}%) "
            f"PV: {coords.to_gtp(int(i))} {sub_pv}")
    return "\n".join(lines)


def to_sgf(tree, komi: float = 7.5, meta: bool = True,
           min_visits: int = 1) -> str:
    """The whole search tree as an SGF variation tree (`trace-mcts`).

    Every node carries ``C[visits / mean value]`` annotations.
    """
    t = _tree_np(tree)

    def color_of(node):
        return "B" if int(t["to_move"][node]) == 1 else "W"

    def emit(node):
        parts = []
        children = t["children"][node]
        kids = [(int(a), int(children[a])) for a in np.flatnonzero(
            children >= 0) if t["node_n"][children[a]] >= min_visits]
        branches = []
        for action, child in kids:
            n = int(t["node_n"][child])
            mean = 1.0 - t["node_w"][child] / max(n, 1)
            move = f";{color_of(node)}[{coords.to_sgf(action)}]" \
                f"C[{n} / {mean:.3f}]"
            branches.append(move + emit(child))
        if len(branches) == 1:
            return branches[0]
        return "".join(f"({b})" for b in branches)

    body = emit(0)
    if meta:
        pl = "B" if int(t["to_move"][0]) == 1 else "W"
        return f"(;GM[1]FF[4]SZ[19]RU[Chinese]KM[{komi:.1f}]PL[{pl}]{body})"
    return body
