"""NN input feature planes, vectorized over the whole board.

Replaces `src/libdg_go/utils/features.rs` (V1, 32 planes, layout documented at
`features.rs:101-148`).  The expensive plane family — "liberties after move"
(planes 12-17/24-29 in 1-based terms) — is the reference's per-candidate
`get_n_liberty_if` walk (`board_fast.rs:484-539`).  Here it is computed for
*all* 361 candidates at once from a counting identity:

    libs_if[p] = sum_e  [e != p]
                 * (empty[e]  OR  e is a stone captured by playing p)
                 * (e adjacent to p  OR  e adjacent to an own chain merged by p)

where "merged by p" compares the ≤4 own-chain ids adjacent to p against the
≤4 own-chain ids adjacent to e — a [361, 361, 4, 4] broadcast-compare that
XLA fuses into one reduction (the MXU/Pallas formulation of the same identity
is a planned optimization).  The identity counts each liberty of the merged
chain exactly once, reproducing `get_n_liberty_if` exactly (validated against
the oracle in tests).

Plane order (0-indexed, `features.rs:104-148`):
  0  komi plane if black to move     1  komi plane if white to move
  2  constant: any move is super-ko  3  most recent move   4 previous move
  5-10   own liberties >= 1..6       11-16  own liberties after move >= 1..6
  17-22  opp liberties >= 1..6       23-28  opp liberties after move >= 1..6
  29 is-super-ko  30 is-ladder-capture  31 is-ladder-escape
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .engine import (
    BLACK,
    EMPTY,
    OFFBOARD,
    GoState,
    _capture_info,
    _pad,
    chain_liberties,
    pseudo_legal_mask,
    superko_mask,
)
from .topology import NBR, NN, SYM

NUM_FEATURES_V1 = 32

# static [361, 361] adjacency matrix (bool)
_ADJ = np.zeros((NN, NN), dtype=bool)
for _p in range(NN):
    for _q in NBR[_p]:
        if _q < NN:
            _ADJ[_p, _q] = True
_EYE = np.eye(NN, dtype=bool)


def liberties_if(state: GoState, color) -> jax.Array:
    """int32[361]: exact liberty count of the chain formed by playing
    ``color`` at each point (garbage at non-pseudo-legal points — mask
    upstream).  Vectorized `get_n_liberty_if` (`board_fast.rs:484-539`)."""
    stones, cid = state.stones, state.chain_id
    color = jnp.asarray(color).astype(stones.dtype)
    opp = (OFFBOARD - color).astype(stones.dtype)

    _, chain_libs = chain_liberties(stones, cid)
    point_libs = jnp.where(stones != EMPTY,
                           chain_libs[jnp.clip(cid, 0, NN)], 0)

    # chain-membership one-hots + static neighbor row-gathers; the pairwise
    # id compares are then MXU matmuls (adjacency-to-common-chain counts),
    # never materializing rank-4 compare tensors
    def adjacency(member):  # member: [q, c] -> [x, c] x adjacent to chain c
        mp = jnp.concatenate([member, jnp.zeros((1, NN), member.dtype)])
        return (mp[NBR[:, 0]] + mp[NBR[:, 1]] + mp[NBR[:, 2]] + mp[NBR[:, 3]]
                > 0)

    onehot = cid[:, None] == np.arange(NN)[None, :]      # [q, c]
    member_own = (onehot & (stones == color)[:, None])
    own_adj = adjacency(member_own).astype(jnp.bfloat16)  # [x, c]

    # match[p, e]: p and e touch a common own chain
    match = jnp.dot(own_adj, own_adj.T,
                    preferred_element_type=jnp.float32) > 0  # [p, e]

    # cap_adj[p, c]: p touches an opponent chain c in atari
    libs1 = (chain_libs[:NN] == 1)
    member_cap = onehot & (stones == opp)[:, None] & libs1[None, :]
    cap_adj = adjacency(member_cap).astype(jnp.bfloat16)
    # cap_member[p, e]: the stone at e is captured by playing p
    cap_member = jnp.dot(cap_adj, member_cap.astype(jnp.bfloat16).T,
                         preferred_element_type=jnp.float32) > 0

    empty = (stones == EMPTY)[None, :]
    open_after = empty | cap_member
    reaches = _ADJ | match
    count = jnp.sum(open_after & reaches & ~_EYE, axis=1)
    return count.astype(jnp.int32)


def features_v1(state: GoState, symmetry: int = 0,
                ladder_capture: jax.Array | None = None,
                ladder_escape: jax.Array | None = None,
                libs_after: tuple | None = None,
                point_libs: jax.Array | None = None,
                pseudo: tuple | None = None) -> jax.Array:
    """float32[19, 19, 32] feature planes (NHWC once batched).

    ``symmetry`` indexes the D8 transform table (0 = identity) and must be a
    static Python int (trace-time constant); for traced symmetry selection use
    :func:`apply_symmetry` on the output.
    """
    stones = state.stones
    me = state.to_move
    opp = (OFFBOARD - me).astype(stones.dtype)
    if point_libs is None:
        point_libs, _ = chain_liberties(stones, state.chain_id)

    own = stones == me
    other = stones == opp
    own_libs = jnp.where(own, point_libs, 0)
    opp_libs = jnp.where(other, point_libs, 0)

    if pseudo is not None:
        valid_me, valid_opp = pseudo
    else:
        valid_me = pseudo_legal_mask(state, me)
        valid_opp = pseudo_legal_mask(state, opp)
    if libs_after is not None:  # precomputed (Pallas kernel, ops/libs_after)
        raw_me, raw_opp = libs_after
    else:
        raw_me, raw_opp = liberties_if(state, me), liberties_if(state, opp)
    libs_if_me = jnp.where(valid_me, raw_me, 0)
    libs_if_opp = jnp.where(valid_opp, raw_opp, 0)

    ko = superko_mask(state, me) & valid_me
    any_ko = jnp.any(ko)

    planes = []
    komi_c = jnp.clip(0.5 + 0.5 * state.komi / 7.5, 0.0, 1.0)
    is_black = (me == BLACK).astype(jnp.float32) * komi_c
    is_white = (me != BLACK).astype(jnp.float32) * komi_c
    ones = jnp.ones(NN, jnp.float32)
    planes.append(ones * is_black)                               # 0
    planes.append(ones * is_white)                               # 1
    planes.append(ones * any_ko.astype(jnp.float32))             # 2

    one_hot = lambda p: (jnp.arange(NN) == p).astype(jnp.float32) * (p < NN)
    planes.append(one_hot(state.last_two[0]))                    # 3
    planes.append(one_hot(state.last_two[1]))                    # 4

    for k in range(1, 7):                                        # 5-10
        planes.append((own_libs >= k).astype(jnp.float32))
    for k in range(1, 7):                                        # 11-16
        planes.append((libs_if_me >= k).astype(jnp.float32))
    for k in range(1, 7):                                        # 17-22
        planes.append((opp_libs >= k).astype(jnp.float32))
    for k in range(1, 7):                                        # 23-28
        planes.append((libs_if_opp >= k).astype(jnp.float32))

    planes.append(ko.astype(jnp.float32))                        # 29
    zeros = jnp.zeros(NN, jnp.float32)
    planes.append(zeros if ladder_capture is None
                  else ladder_capture.astype(jnp.float32))       # 30
    planes.append(zeros if ladder_escape is None
                  else ladder_escape.astype(jnp.float32))        # 31

    feats = jnp.stack(planes, axis=-1)                           # [361, 32]
    if symmetry != 0:
        feats = feats[SYM[symmetry]]
    return feats.reshape(19, 19, NUM_FEATURES_V1)


def resolve_ladders_exact(value: bool | None) -> bool:
    """Resolve the auto (``None``) ladder-reader choice for the backend.

    Exact on tpu — the Pallas branching-DFS kernel
    (`ops/ladder_kernel.py`) makes the reference's exact semantics
    (`ladder.rs:53-119`) the *fast* path there — greedy elsewhere, where
    the exact XLA pooled-lane DFS costs seconds per large batch.  One
    resolved value must drive every feature extraction a net sees
    (root eval and leaf expansion alike) so planes 30/31 keep one
    semantics within a search."""
    if value is None:
        return jax.default_backend() == "tpu"
    return bool(value)


def extract_batch(states: GoState, feature_set: str = "v1",
                  with_ladders: bool = False,
                  use_kernel: bool = False,
                  ladders_exact: bool | None = None) -> jax.Array:
    """Batched features for the configured plane set.

    ``ladders_exact=None`` resolves per backend (exact kernel on tpu,
    greedy single-line reader elsewhere — measured 97.9% per-candidate
    agreement with the exact branch DFS on real-game positions,
    `tools/measure_ladder_greedy.py`)."""
    ladders_exact = resolve_ladders_exact(ladders_exact)
    if feature_set == "v2":
        return jax.vmap(
            lambda s: features_v2(s, with_ladders, ladders_exact))(states)
    return features_v1_batch(states, with_ladders, use_kernel, ladders_exact)


def features_v1_batch(states: GoState, with_ladders: bool = False,
                      use_kernel: bool = False,
                      ladders_exact: bool = False) -> jax.Array:
    """Batched feature extraction; ``use_kernel`` offloads the
    liberties-after-move planes to the Pallas kernel (TPU only)."""
    greedy = not ladders_exact
    if not use_kernel:
        if with_ladders:
            # chunked so the per-candidate DFS stacks stay bounded
            from .ladder import ladder_planes_batch

            cap, esc = ladder_planes_batch(states, greedy=greedy)
            return jax.vmap(
                lambda s, c, e: features_v1(s, ladder_capture=c,
                                            ladder_escape=e)
            )(states, cap, esc)
        return jax.vmap(
            lambda s: features_v1_full(s, with_ladders))(states)
    from ..ops.libs_after import board_features_raw

    raw = board_features_raw(states)
    me_black = (states.to_move == 1)[:, None]
    libs_me = jnp.where(me_black, raw["libs_if_black"], raw["libs_if_white"])
    libs_opp = jnp.where(me_black, raw["libs_if_white"], raw["libs_if_black"])
    pseudo_me = jnp.where(me_black, raw["pseudo_black"], raw["pseudo_white"])
    pseudo_opp = jnp.where(me_black, raw["pseudo_white"], raw["pseudo_black"])

    if with_ladders:
        from .ladder import ladder_planes_batch

        caps, escs = ladder_planes_batch(states, greedy=greedy)
        return jax.vmap(
            lambda state, lm, lo, pls, pm, po, c, e: features_v1(
                state, libs_after=(lm, lo), point_libs=pls, pseudo=(pm, po),
                ladder_capture=c, ladder_escape=e)
        )(states, libs_me, libs_opp, raw["point_libs"], pseudo_me,
          pseudo_opp, caps, escs)

    return jax.vmap(
        lambda state, lm, lo, pls, pm, po: features_v1(
            state, libs_after=(lm, lo), point_libs=pls, pseudo=(pm, po))
    )(states, libs_me, libs_opp, raw["point_libs"], pseudo_me, pseudo_opp)


def features_v1_full(state: GoState, with_ladders: bool = False,
                     max_ladder_candidates: int = 24,
                     ladders_exact: bool = False) -> jax.Array:
    """V1 features with optional ladder planes 31/32 (static choice).

    Ladder reading costs a bounded chase per candidate (`go/ladder.py`); the
    reference always computes them (`features.rs:208-222`), here they are a
    static flag so the fast self-play path can skip them.
    """
    if not with_ladders:
        return features_v1(state)
    from .ladder import ladder_planes  # local import avoids cycle at init

    cap, esc = ladder_planes(state, max_ladder_candidates,
                             greedy=not ladders_exact)
    return features_v1(state, ladder_capture=cap, ladder_escape=esc)


def apply_symmetry(planes: jax.Array, symmetry: jax.Array) -> jax.Array:
    """Apply a traced D8 transform index to [..., 19, 19, C] planes."""
    flat = planes.reshape(planes.shape[:-3] + (NN, planes.shape[-1]))
    perm = jnp.asarray(SYM)[symmetry]
    return jnp.take(flat, perm, axis=-2).reshape(planes.shape)


# static corner/edge masks for the V2 plane set
_VX = np.arange(NN) % 19
_VY = np.arange(NN) // 19
_IS_EDGE_RING = (_VX == 0) | (_VX == 18) | (_VY == 0) | (_VY == 18)
_IS_CORNER_PT = ((_VX == 0) | (_VX == 18)) & ((_VY == 0) | (_VY == 18))

NUM_FEATURES_V2 = 18


def features_v2(state: GoState, with_ladders: bool = False,
                ladders_exact: bool = False) -> jax.Array:
    """float32[19, 19, 18]: the alternative V2 plane set
    (`features.rs:253-396`; not the upstream default).

    0 ones; 1 komi from the mover's perspective in [-1, 1] (the reference's
    ``self_komi`` has a clamp bug that pins it to -1 — the intended clip is
    implemented here); 2 own stones; 3 opponent stones; 4-7 chains with
    exactly 1..4 liberties; 8-9 would-have exactly 1..2 liberties if played;
    10 valid move; 11 own Benson eye; 12 opponent Benson eye; 13 super-ko;
    14 ladder capture; 15 ladder escape; 16 corner; 17 edge.
    """
    from .benson import benson

    stones = state.stones
    me = state.to_move
    opp = (OFFBOARD - me).astype(stones.dtype)
    point_libs, _ = chain_liberties(stones, state.chain_id)
    valid_me = pseudo_legal_mask(state, me)
    libs_if_me = jnp.where(valid_me, liberties_if(state, me), 0)
    ko = superko_mask(state, me) & valid_me
    _, eye_me = benson(stones, state.chain_id, me)
    _, eye_opp = benson(stones, state.chain_id, opp)

    komi_signed = jnp.where(me == BLACK, -state.komi, state.komi)
    komi_c = jnp.clip(komi_signed / 7.5, -1.0, 1.0)

    if with_ladders:
        from .ladder import ladder_planes

        cap, esc = ladder_planes(state, greedy=not ladders_exact)
    else:
        cap = jnp.zeros(NN, bool)
        esc = jnp.zeros(NN, bool)

    f32 = lambda x: jnp.asarray(x).astype(jnp.float32)
    planes = [
        jnp.ones(NN, jnp.float32),                       # 0
        jnp.full(NN, 1.0) * komi_c,                      # 1
        f32(stones == me),                               # 2
        f32(stones == opp),                              # 3
        f32(point_libs == 1),                            # 4
        f32(point_libs == 2),                            # 5
        f32(point_libs == 3),                            # 6
        f32(point_libs == 4),                            # 7
        f32(valid_me & (libs_if_me == 1)),               # 8
        f32(valid_me & (libs_if_me == 2)),               # 9
        f32(valid_me),                                   # 10
        f32(eye_me),                                     # 11
        f32(eye_opp),                                    # 12
        f32(ko),                                         # 13
        f32(cap & valid_me),                             # 14
        f32(esc & valid_me),                             # 15
        f32(jnp.asarray(_IS_CORNER_PT)),                 # 16
        f32(jnp.asarray(_IS_EDGE_RING & ~_IS_CORNER_PT)),  # 17
    ]
    return jnp.stack(planes, axis=-1).reshape(19, 19, NUM_FEATURES_V2)
