"""Vectorized Go rules engine (Tromp-Taylor + positional super-ko).

TPU-native replacement for `src/libdg_go/board.rs` + `board_fast.rs`.  The
reference maintains per-vertex packed bitfields with circular linked-list
chains and incremental liberty counters — an inherently sequential pointer
design.  Here the board is a handful of dense arrays and every rule is a
fixed-shape vectorized computation, so thousands of boards step in lockstep
under ``jit``/``vmap``:

- ``stones``    int8[361]: 0 empty / 1 black / 2 white.
- ``chain_id``  int32[361]: the id of the chain occupying each point (ids are
  point indices; the representative is the minimum member index).  Chain merge
  on placement is a single vectorized relabel over ≤4 neighbor chain ids —
  no union-find iteration is needed because a placed stone can only join its
  ≤4 adjacent chains (replaces `board_fast.rs:277-327` `join_blocks`).
- liberties are recomputed exactly on demand in one vectorized pass: each
  empty point contributes one liberty to each *distinct* adjacent chain
  (≤4-way dedup), accumulated with a scatter-add (replaces the incremental
  `num_liberties` counters of `board_fast.rs:46-58`).
- positional super-ko: 64-bit zobrist hash kept as a uint32 pair, with a
  fixed-size ring of the most recent ``history_len`` post-move hashes
  (replaces `board.rs:132-141` `_is_ko` + the 64-slot `SmallSet64`).
  Candidate hashes for *all* 361 points are computed at once using per-chain
  XOR aggregates (replaces `board_fast.rs:406-423` `place_if`).

Legality (`is_valid`, `board_fast.rs:216-243`): a move at an empty point is
legal iff it has an empty neighbor, an adjacent own chain with ≥2 liberties,
or an adjacent opponent chain with exactly 1 liberty (suicide is illegal);
super-ko then filters moves whose resulting hash appears in the ring.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .topology import IOTA, NBR, NN, PASS
from .zobrist import Z

N = 19
EMPTY, BLACK, WHITE = 0, 1, 2
OFFBOARD = 3  # sentinel color for the padded gather slot

# Module-level constants stay as NUMPY arrays on purpose: a jnp array created
# at import time is committed to the default device, and when that device is a
# remote TPU tunnel, embedding it as an MLIR constant forces a device->host
# fetch per trace.  Numpy constants embed into the lowered module directly.
_NBR = NBR
_IOTA = IOTA
_ZB = Z[0]  # [361, 2] uint32, black
_ZW = Z[1]  # [361, 2] uint32, white
_SHIFTS = np.arange(32, dtype=np.uint32)


class GoState(struct.PyTreeNode):
    """Single-board state; batch by adding a leading axis via ``vmap``."""

    stones: jax.Array        # int8[361]
    chain_id: jax.Array      # int32[361] (valid where stones != EMPTY)
    chain_xor: jax.Array     # uint32[361, 2]: per-POINT copy of the zobrist
    #                          XOR aggregate of the chain containing each
    #                          stone (every member row is written on merge,
    #                          so neighbor reads are static gathers; _place)
    to_move: jax.Array       # int8 scalar: BLACK or WHITE
    hash: jax.Array          # uint32[2]
    hash_hist: jax.Array     # uint32[history_len, 2] ring of post-move hashes
    placed_count: jax.Array  # int32 scalar: stones placed (ring write cursor)
    move_count: jax.Array    # int32 scalar: total moves incl. passes
    pass_count: jax.Array    # int32 scalar: consecutive passes
    last_two: jax.Array      # int32[2]: most recent / previous placed points
    komi: jax.Array          # float32 scalar
    done: jax.Array          # bool scalar: both players passed


def new_state(komi: float = 7.5, history_len: int = 64) -> GoState:
    return GoState(
        stones=jnp.zeros(NN, jnp.int8),
        chain_id=jnp.asarray(IOTA),
        chain_xor=jnp.zeros((NN, 2), jnp.uint32),
        to_move=jnp.int8(BLACK),
        hash=jnp.zeros(2, jnp.uint32),
        hash_hist=jnp.zeros((history_len, 2), jnp.uint32),
        placed_count=jnp.int32(0),
        move_count=jnp.int32(0),
        pass_count=jnp.int32(0),
        last_two=jnp.full(2, PASS, jnp.int32),
        komi=jnp.float32(komi),
        done=jnp.bool_(False),
    )


def _pad(arr: jax.Array, fill) -> jax.Array:
    """Append the sentinel slot used by off-board `NBR` gathers."""
    return jnp.concatenate([arr, jnp.full((1,), fill, arr.dtype)])


def _dedup4(ids: jax.Array, valid: jax.Array) -> jax.Array:
    """First-occurrence mask over the last axis of size 4.

    Mirrors the reference's ``seen_blocks: [Point; 4]`` dedup idiom
    (`board_fast.rs:406-423`): entry k survives iff valid and no earlier valid
    entry carries the same id.
    """
    i0, i1, i2, i3 = (ids[..., k] for k in range(4))
    v0, v1, v2, v3 = (valid[..., k] for k in range(4))
    k0 = v0
    k1 = v1 & ~(v0 & (i1 == i0))
    k2 = v2 & ~(v0 & (i2 == i0)) & ~(v1 & (i2 == i1))
    k3 = v3 & ~(v0 & (i3 == i0)) & ~(v1 & (i3 == i1)) & ~(v2 & (i3 == i2))
    return jnp.stack([k0, k1, k2, k3], axis=-1)


def chain_liberties(stones: jax.Array, chain_id: jax.Array):
    """Exact per-chain liberty counts in one vectorized pass.

    Returns ``(point_libs[361], chain_libs[362])`` where ``point_libs[p]`` is
    the liberty count of the chain occupying p (0 for empty points) and
    ``chain_libs`` is indexed by chain id (entry 361 stays 0).

    Formulated as a dense [empty-point x chain] adjacency reduction — the
    distinct-liberty dedup falls out of the boolean OR over the four neighbor
    slots.  Scatter-based segment sums are catastrophically slow on TPU
    (540x slower than this form, measured), so no ``.at[].add`` here.
    """
    empty = stones == EMPTY                  # [361]

    # membership matrix M[q, c] = stone at q belongs to chain c: ONE
    # [361, 361] compare.  adj[e, c] = empty e touches chain c is then an OR
    # of four STATIC row-gathers of M — never materialize the rank-4
    # [e, k, c] compare (XLA expands it into multi-GB iota/broadcasts).
    member = (chain_id[:, None] == _IOTA[None, :]) \
        & (stones != EMPTY)[:, None]         # [q, c]
    member_p = jnp.concatenate(
        [member, jnp.zeros((1, NN), bool)])  # sentinel row for off-board
    adj = member_p[_NBR[:, 0]] | member_p[_NBR[:, 1]] \
        | member_p[_NBR[:, 2]] | member_p[_NBR[:, 3]]
    adj = adj & empty[:, None]               # [e, c]
    chain_libs = jnp.concatenate(
        [jnp.sum(adj, axis=0, dtype=jnp.int32), jnp.zeros(1, jnp.int32)])
    point_libs = jnp.where(
        stones != EMPTY, chain_libs[jnp.clip(chain_id, 0, NN)], 0)
    return point_libs, chain_libs


def recompute_chain_xor(stones: jax.Array, chain_id: jax.Array) -> jax.Array:
    """uint32[361, 2]: per-chain XOR of zobrist entries (from scratch).

    Rows are indexed by chain id; gather through ``chain_id`` to rebuild the
    per-point ``GoState.chain_xor`` field.  ``_place`` maintains the
    per-point form in O(361) per move; this is for tests/recovery.  The bit-plane parity
    is computed with an explicit [c, p] compare-reduce (no shared-operand
    matmul: XLA rewrites those into pathological base-dilated convolutions
    under vmap).
    """
    zc = jnp.where((stones == BLACK)[:, None], _ZB,
                   jnp.where((stones == WHITE)[:, None], _ZW, 0))  # [361, 2]
    bits = ((zc[:, :, None] >> _SHIFTS) & jnp.uint32(1))  # [361p, 2, 32]
    member = ((stones != EMPTY)[None, :]
              & (chain_id[None, :] == _IOTA[:, None]))     # [c, p]
    seg = jnp.sum(member[:, :, None, None] * bits[None, :, :, :],
                  axis=1, dtype=jnp.uint32)                # [c, 2, 32]
    parity = seg & jnp.uint32(1)
    return jnp.sum(parity << _SHIFTS, axis=-1, dtype=jnp.uint32)  # [361, 2]


def _capture_info(state: GoState, color):
    """Per-candidate capture analysis shared by legality and stepping.

    For every point p, which of its ≤4 neighbors head opponent chains in atari
    (their lone liberty is necessarily p), deduplicated.  Returns
    ``(nbr_st, nbr_cid, nbr_libs, cap_keep)`` each shaped [361, 4].
    """
    _, chain_libs = chain_liberties(state.stones, state.chain_id)
    st_p = _pad(state.stones, OFFBOARD)
    cid_p = _pad(state.chain_id, -1)
    nbr_st = st_p[_NBR]
    nbr_cid = cid_p[_NBR]
    nbr_libs = chain_libs[jnp.clip(nbr_cid, 0, NN)]
    opp = (OFFBOARD - jnp.asarray(color)).astype(nbr_st.dtype)
    is_cap = (nbr_st == opp) & (nbr_libs == 1)
    cap_keep = _dedup4(nbr_cid, is_cap)
    return nbr_st, nbr_cid, nbr_libs, cap_keep, chain_libs


def candidate_hashes(state: GoState, color) -> jax.Array:
    """Post-move zobrist hash for playing ``color`` at every point: u32[361, 2].

    Vectorized equivalent of `board_fast.rs:406-423` (`place_if`) evaluated
    for all candidates at once: ``h ^ z[color][p] ^ XOR(captured chains)``.
    """
    _, nbr_cid, _, cap_keep, _ = _capture_info(state, color)
    # chain_xor is maintained per POINT (every stone holds its chain's
    # aggregate), so neighbor reads are static gathers, not id lookups
    cxor_p = jnp.concatenate(
        [state.chain_xor, jnp.zeros((1, 2), jnp.uint32)])[_NBR]  # [361,4,2]
    m = jnp.where(cap_keep[:, :, None], cxor_p, jnp.uint32(0))
    cap_xor = m[:, 0] ^ m[:, 1] ^ m[:, 2] ^ m[:, 3]
    z_me = jnp.where(jnp.asarray(color) == BLACK, _ZB, _ZW)
    return state.hash[None, :] ^ z_me ^ cap_xor                 # [361, 2]


def pseudo_legal_mask(state: GoState, color=None) -> jax.Array:
    """Tromp-Taylor legality ignoring super-ko: bool[361].

    Parity with `board_fast.rs:216-243` (`is_valid`): empty point with an
    empty neighbor, an adjacent own chain with ≥2 liberties, or an adjacent
    opponent chain in atari.
    """
    color = state.to_move if color is None else color
    nbr_st, _, nbr_libs, _, _ = _capture_info(state, color)
    me = jnp.asarray(color).astype(nbr_st.dtype)
    opp = (OFFBOARD - jnp.asarray(color)).astype(nbr_st.dtype)
    empty = state.stones == EMPTY
    has_empty_nbr = jnp.any(nbr_st == EMPTY, axis=1)
    own_alive = jnp.any((nbr_st == me) & (nbr_libs >= 2), axis=1)
    captures = jnp.any((nbr_st == opp) & (nbr_libs == 1), axis=1)
    return empty & (has_empty_nbr | own_alive | captures)


def superko_mask(state: GoState, color=None) -> jax.Array:
    """bool[361]: True where playing would repeat a position in the ring."""
    color = state.to_move if color is None else color
    h_cand = candidate_hashes(state, color)                     # [361, 2]
    hist = state.hash_hist                                      # [K, 2]
    k = hist.shape[0]
    valid = jnp.arange(k, dtype=jnp.int32) < state.placed_count
    same = jnp.all(h_cand[:, None, :] == hist[None, :, :], axis=-1)  # [361, K]
    return jnp.any(same & valid[None, :], axis=1)


def legal_mask(state: GoState, color=None) -> jax.Array:
    """Full legality including super-ko: bool[362] (index 361 = pass).

    Parity with `board.rs:151-153` (`is_valid` = rules + ``!_is_ko``).  Pass
    is always legal.  When the game is done every move is illegal except pass.
    """
    color = state.to_move if color is None else color
    moves = pseudo_legal_mask(state, color) & ~superko_mask(state, color)
    moves = moves & ~state.done
    return jnp.concatenate([moves, jnp.ones(1, bool)])


def place_stones(stones: jax.Array, chain_id: jax.Array, color, p,
                 chain_libs: jax.Array | None = None):
    """Hash-free placement on raw (stones, chain_id) arrays.

    Returns ``(stones, chain_id)`` after placing ``color`` at ``p`` with
    captures and chain merging; used by the ladder reader
    (`utils/ladder.rs`) where super-ko bookkeeping is irrelevant.

    ``chain_libs`` (u/int32[362], indexed by chain id) may be passed when the
    caller already holds this board's liberty table — the ladder chase
    computes it once per placement anyway, and the [point x chain] reduction
    inside :func:`chain_liberties` is the dominant per-rung cost.
    """
    color = jnp.asarray(color).astype(stones.dtype)
    opp = (OFFBOARD - color).astype(stones.dtype)
    if chain_libs is None:
        _, chain_libs = chain_liberties(stones, chain_id)
    st_p = _pad(stones, OFFBOARD)
    cid_p = _pad(chain_id, -1)
    nbr_p = jnp.asarray(_NBR)[p]  # traced index into the numpy table
    nbr_st = st_p[nbr_p]
    nbr_cid = cid_p[nbr_p]
    nbr_libs = chain_libs[jnp.clip(nbr_cid, 0, NN)]

    cap_k = (nbr_st == opp) & (nbr_libs == 1)
    cap_ids = jnp.where(cap_k, nbr_cid, -2)
    captured = (stones == opp) & jnp.any(
        chain_id[:, None] == cap_ids[None, :], axis=1)

    own_k = nbr_st == color
    own_ids = jnp.where(own_k, nbr_cid, NN + 1)
    new_id = jnp.minimum(p.astype(jnp.int32), jnp.min(own_ids))
    member = (stones == color) & jnp.any(
        chain_id[:, None] == jnp.where(own_k, nbr_cid, -2)[None, :], axis=1)

    at_p = _IOTA == p
    stones2 = jnp.where(at_p, color, jnp.where(captured, EMPTY, stones))
    cid2 = jnp.where(member, new_id, chain_id)
    cid2 = jnp.where(at_p, new_id, jnp.where(captured, _IOTA, cid2))
    return stones2, cid2


def _place(state: GoState, p: jax.Array) -> GoState:
    """Place ``to_move``'s stone at point ``p`` (assumed legal).

    Vectorized equivalent of `board_fast.rs:434-474` (`place`) +
    `board.rs:164-188`: capture adjacent atari chains, merge own chains by
    relabeling, update hash/history.
    """
    me = state.to_move
    opp = (OFFBOARD - me).astype(jnp.int8)
    stones, cid = state.stones, state.chain_id

    nbr_st, nbr_cid, nbr_libs, cap_keep, _ = _capture_info(state, me)
    nbr_st_p, nbr_cid_p = nbr_st[p], nbr_cid[p]                 # [4]
    cap_keep_p = cap_keep[p]                                    # [4]

    # captured stones: members of the deduped atari chains adjacent to p
    cap_ids = jnp.where(cap_keep_p, nbr_cid_p, -2)              # [4]
    captured = (stones == opp) & jnp.any(
        cid[:, None] == cap_ids[None, :], axis=1)               # [361]

    # merge own chains: new id = min(p, adjacent own chain ids)
    own_k = nbr_st_p == me
    own_ids = jnp.where(own_k, nbr_cid_p, NN + 1)
    new_id = jnp.minimum(p.astype(jnp.int32), jnp.min(own_ids))
    member = (stones == me) & jnp.any(
        cid[:, None] == jnp.where(own_k, nbr_cid_p, -2)[None, :], axis=1)

    # single-point writes as iota-selects: .at[p].set under vmap lowers to
    # scatter, which is slow on TPU
    at_p = _IOTA == p
    stones2 = jnp.where(at_p, me, jnp.where(captured, EMPTY, stones))
    cid2 = jnp.where(member, new_id, cid)
    cid2 = jnp.where(at_p, new_id, jnp.where(captured, _IOTA, cid2))

    # hash: own stone in, captured chains out via the incremental per-chain
    # XOR aggregates (O(1) lookups instead of any reduction)
    z_me = jnp.where(me == BLACK, _ZB, _ZW)
    nbr_p = jnp.asarray(_NBR)[p]                                 # [4]
    cxor_nbr = jnp.concatenate(
        [state.chain_xor, jnp.zeros((1, 2), jnp.uint32)])[nbr_p]  # [4, 2]
    cap_rows = jnp.where(cap_keep_p[:, None], cxor_nbr, jnp.uint32(0))
    cap_xor = cap_rows[0] ^ cap_rows[1] ^ cap_rows[2] ^ cap_rows[3]
    h2 = state.hash ^ z_me[p] ^ cap_xor

    # maintain chain_xor: the merged chain's aggregate = z[p] ^ XOR of the
    # (deduplicated) adjacent own chains; captured chains' rows die
    own_keep = _dedup4(nbr_cid_p, own_k)
    own_rows = jnp.where(own_keep[:, None], cxor_nbr, jnp.uint32(0))
    new_xor = z_me[p] ^ own_rows[0] ^ own_rows[1] ^ own_rows[2] ^ own_rows[3]
    cxor2 = jnp.where((member | at_p)[:, None], new_xor[None, :],
                      state.chain_xor)
    cxor2 = jnp.where(captured[:, None], jnp.uint32(0), cxor2)

    k = state.hash_hist.shape[0]
    at_slot = (jnp.arange(k) == state.placed_count % k)[:, None]
    hist2 = jnp.where(at_slot, h2[None, :], state.hash_hist)

    return state.replace(
        stones=stones2,
        chain_id=cid2,
        chain_xor=cxor2,
        to_move=opp,
        hash=h2,
        hash_hist=hist2,
        placed_count=state.placed_count + 1,
        move_count=state.move_count + 1,
        pass_count=jnp.int32(0),
        last_two=jnp.stack([p.astype(jnp.int32), state.last_two[0]]),
    )


def step(state: GoState, action: jax.Array) -> GoState:
    """Apply an action (0..360 = point, 361 = pass); no-op once done.

    The action is assumed legal (mask with :func:`legal_mask` upstream); this
    matches the reference's unchecked `place` (`board.rs:164-188`).  Both the
    place and pass branches are computed unconditionally and selected, which
    keeps the function dense under ``vmap``.
    """
    action = jnp.asarray(action, jnp.int32)
    is_pass = action >= PASS
    p = jnp.minimum(action, PASS - 1)

    placed = _place(state, p)
    passed = state.replace(
        to_move=(OFFBOARD - state.to_move).astype(jnp.int8),
        move_count=state.move_count + 1,
        pass_count=state.pass_count + 1,
        done=state.done | (state.pass_count + 1 >= 2),
    )

    out = jax.tree_util.tree_map(
        lambda a, b: jnp.where(_expand(is_pass, a), a, b), passed, placed)
    # a finished game is frozen
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(_expand(state.done, a), a, b), state, out)


def _expand(cond: jax.Array, like: jax.Array) -> jax.Array:
    return cond.reshape(cond.shape + (1,) * (like.ndim - cond.ndim))


# ---------------------------------------------------------------------------
# batched conveniences


def new_states(batch: int, komi: float = 7.5, history_len: int = 64) -> GoState:
    """A batch of fresh boards (leading axis ``batch``)."""
    one = new_state(komi, history_len)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), one)


step_batch = jax.vmap(step)
legal_mask_batch = jax.vmap(legal_mask)


@functools.partial(jax.jit, static_argnums=())
def jit_step(state: GoState, action: jax.Array) -> GoState:
    return step(state, action)
