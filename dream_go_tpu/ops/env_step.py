"""Fused Pallas TPU kernel: legality + weighted move sampling + board update.

The speed-of-light path for batched self-play rollouts.  The XLA version of
one env step (``legal_mask`` + ``choose`` + ``step``) moves several
[B,361,361]-class intermediates through HBM with layout copies; this kernel
keeps the whole per-board computation in VMEM, one board per grid step, with
all state buffers updated in place (``input_output_aliases``):

- neighbor access is ``pltpu.roll`` + static edge masks — no gathers;
- the only matrix work is the [384,384] chain-membership/adjacency pair for
  exact distinct liberty counts (one MXU matvec);
- per-chain zobrist aggregates are stored **per point** (the aggregate of
  the chain containing each point), so super-ko candidate hashes for all
  361 points are pure elementwise u32 XORs;
- sampling is a Gumbel argmax over ``log(weights)`` using the in-kernel PRNG
  (uniform random when weights are all ones).

State layout per board (see :func:`pack_states` / :func:`unpack_states`):
  stones  i32[1, 384]   0 empty / 1 black / 2 white (pad 0)
  cid     i32[1, 384]   chain id (point index of min member)
  cxp     u32[2, 384]   per-point chain zobrist aggregate (2 words)
  hist    u32[2, 128]   super-ko ring, 64 entries used (2 words)
  meta    i32[1, 8]     to_move, placed, move_count, pass_count, done,
                        last0, last1, pad
  hash    u32[1, 8]     words 0..1 used
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..go import engine as goe
from ..go.topology import NN
from ..go.zobrist import Z

NP = 384   # padded point axis (3 x 128 lanes)
RING = 64  # super-ko history entries (engine default)
N = 19

_IDX = np.arange(NP)
_VALID = (_IDX < NN)
_MASK = {
    +1: (_VALID & (_IDX % N > 0)),            # value rolled from q-1 (left)
    -1: (_VALID & (_IDX % N < N - 1)),        # from q+1 (right)
    +N: (_VALID & (_IDX >= N)),               # from q-19 (up)
    -N: (_VALID & (_IDX < NN - N) & (_IDX % N == _IDX % N)),  # from q+19
}
_MASK[-N] = (_VALID & (_IDX + N < NN))
_SHIFTS = (1, -1, N, -N)

def _roll(x, shift, axis):
    return pltpu.roll(x, shift % x.shape[axis], axis)


_ZB = np.zeros((NP, 2), np.uint32)
_ZB[:NN] = Z[0]
_ZW = np.zeros((NP, 2), np.uint32)
_ZW[:NN] = Z[1]


def _make_kernel(use_prng: bool):
    def kern(*args):
        return _kernel(use_prng, *args)
    return kern


def _kernel(use_prng, seed_ref, consts_ref, zob_ref, stones_ref, cid_ref,
            cxp_ref, hist_ref, meta_ref, hash_ref, weights_ref, rbits_ref,
            stones_o, cid_o, cxp_o, hist_o, meta_o, hash_o, move_o):
    b = pl.program_id(0)
    mask_row = {1: 1, -1: 2, N: 3, -N: 4}
    stones = stones_ref[0, 0:1, :]                  # i32 [1, NP]
    cid = cid_ref[0, 0:1, :]
    cxp0 = cxp_ref[0, 0:1, :]                       # u32 [1, NP]
    cxp1 = cxp_ref[0, 1:2, :]
    h0 = hash_ref[0, 0, 0]                          # u32 scalars
    h1 = hash_ref[0, 0, 1]
    to_move = meta_ref[0, 0, 0]
    placed = meta_ref[0, 0, 1]
    move_count = meta_ref[0, 0, 2]
    pass_count = meta_ref[0, 0, 3]
    done = meta_ref[0, 0, 4]

    me = to_move
    opp = 3 - me
    valid = consts_ref[0:1, :] > 0
    empty = (stones == 0) & valid
    oppm = (stones == opp) & valid

    # ---- exact liberty counts: membership + adjacency + matvec ------------
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (NP, NP), 1)
    stonep = ((stones > 0) & valid).astype(jnp.int32).reshape(NP, 1)
    m = jnp.where((iota_c == cid.reshape(NP, 1)) & (stonep > 0), 1.0, 0.0)

    adj = jnp.zeros((NP, NP), jnp.float32)
    for s in _SHIFTS:
        adj = jnp.maximum(
            adj, _roll(m, s, 0)
            * consts_ref[mask_row[s]:mask_row[s] + 1, :]
            .astype(jnp.float32).reshape(NP, 1))
    adj = adj * empty.astype(jnp.float32).reshape(NP, 1)
    chain_libs = jnp.sum(adj, axis=0)                        # f32 [c]
    pl_q = jnp.dot(m, chain_libs.reshape(NP, 1),
                   preferred_element_type=jnp.float32) \
        .reshape(1, NP).astype(jnp.int32)                    # libs at q

    # ---- neighbor tables via rolls ---------------------------------------
    nbr = []  # (stone, libs, cid, cx0, cx1, onboard) per direction
    for s in _SHIFTS:
        mk = consts_ref[mask_row[s]:mask_row[s] + 1, :] > 0
        nbr.append((
            jnp.where(mk, _roll(stones, s, 1), 3),
            jnp.where(mk, _roll(pl_q, s, 1), 0),
            jnp.where(mk, _roll(cid, s, 1), -1),
            jnp.where(mk, _roll(cxp0, s, 1), 0),
            jnp.where(mk, _roll(cxp1, s, 1), 0),
            mk,
        ))

    # ---- pseudo-legality (board_fast.rs:216-243) --------------------------
    has_empty = jnp.zeros((1, NP), bool)
    own_ok = jnp.zeros((1, NP), bool)
    for st_k, pl_k, _, _, _, _ in nbr:
        has_empty |= st_k == 0
        own_ok |= (st_k == me) & (pl_k >= 2)
    cap_k = [(st_k == opp) & (pl_k == 1) for st_k, pl_k, *_ in nbr]
    cap_any = cap_k[0] | cap_k[1] | cap_k[2] | cap_k[3]
    pseudo = empty & (has_empty | own_ok | cap_any)

    # ---- super-ko candidate hashes (all points at once) -------------------
    # deduplicate captured neighbor chains, XOR their aggregates
    keep = []
    for k in range(4):
        dup = jnp.zeros((1, NP), bool)
        for j in range(k):
            dup |= cap_k[j] & (nbr[j][2] == nbr[k][2])
        keep.append(cap_k[k] & ~dup)
    capx0 = jnp.zeros((1, NP), jnp.int32)
    capx1 = jnp.zeros((1, NP), jnp.int32)
    for k in range(4):
        capx0 ^= jnp.where(keep[k], nbr[k][3], 0)
        capx1 ^= jnp.where(keep[k], nbr[k][4], 0)

    zme0 = jnp.where(me == 1, zob_ref[0:1, :], zob_ref[2:3, :])
    zme1 = jnp.where(me == 1, zob_ref[1:2, :], zob_ref[3:4, :])
    hc0 = h0 ^ zme0 ^ capx0                                  # [1, NP]
    hc1 = h1 ^ zme1 ^ capx1

    hist0 = hist_ref[0, 0:1, :RING]                          # u32 [1, RING]
    hist1 = hist_ref[0, 1:2, :RING]
    ring_valid = (jax.lax.broadcasted_iota(jnp.int32, (1, RING), 1)
                  < jnp.minimum(placed, RING))
    match = ((hc0.reshape(NP, 1) == hist0.reshape(1, RING))
             & (hc1.reshape(NP, 1) == hist1.reshape(1, RING))
             & ring_valid.reshape(1, RING))
    in_ring = jnp.max(match.astype(jnp.int32), axis=1).reshape(1, NP)

    legal = pseudo & (in_ring == 0) & (done == 0)

    # ---- sample: Gumbel argmax over legal weights -------------------------
    if use_prng:
        pltpu.prng_seed(seed_ref[0]
                        + b * jnp.int32(7919)
                        + move_count * jnp.int32(65537))
        bits = jax.lax.bitcast_convert_type(
            pltpu.prng_random_bits((1, NP)), jnp.int32)
    else:
        bits = rbits_ref[0, 0:1, :]
    u = jax.lax.shift_right_logical(bits, 8).astype(jnp.float32) \
        * (1.0 / 16777216.0)
    gumbel = -jnp.log(-jnp.log(jnp.clip(u, 1e-7, 1.0 - 1e-7)))
    w = jnp.maximum(weights_ref[0, 0:1, :], 0.0)
    score = jnp.where(legal & (w > 0), jnp.log(w + 1e-30) + gumbel, -jnp.inf)
    any_legal = jnp.any(score > -jnp.inf)
    p = jnp.argmax(score.reshape(NP)).astype(jnp.int32)
    is_pass = (~any_legal) | (done > 0)
    p = jnp.where(is_pass, 0, p)

    # ---- apply ------------------------------------------------------------
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (1, NP), 1)
    at_p = iota_q == p

    def scalar_at_p(vec_i32):
        return jnp.sum(jnp.where(at_p, vec_i32, 0))

    # cids of p's neighbors (as scalars), with their capture/own flags
    cap_sc, own_sc = [], []
    for k in range(4):
        st_k, pl_k, cid_k, *_ = nbr[k]
        cap_sc.append((scalar_at_p(jnp.where(cap_k[k], cid_k, -7)),))
        is_own = (st_k == me)
        own_sc.append((scalar_at_p(jnp.where(is_own, cid_k, -7)),
                       scalar_at_p(is_own.astype(jnp.int32))))
    captured = jnp.zeros((1, NP), bool)
    member = jnp.zeros((1, NP), bool)
    new_id = p
    for k in range(4):
        cap_id = cap_sc[k][0]
        captured |= (cid == cap_id) & (cap_id >= 0) & oppm
        own_id, own_flag = own_sc[k]
        member |= (cid == own_id) & (own_id >= 0) & (stones == me)
        new_id = jnp.where((own_flag > 0) & (own_id >= 0),
                           jnp.minimum(new_id, own_id), new_id)

    placing = ~is_pass
    cap_eff = captured & placing
    mem_eff = member & placing
    atp_eff = at_p & placing

    stones2 = jnp.where(atp_eff, me, jnp.where(cap_eff, 0, stones))
    cid2 = jnp.where(mem_eff | atp_eff, new_id,
                     jnp.where(cap_eff, iota_q, cid))

    # new chain aggregate = z[me][p] ^ XOR of distinct merged own chains
    own_keep = []
    for k in range(4):
        dup = False
        acc = jnp.bool_(False)
        for j in range(k):
            acc = acc | ((own_sc[j][0] == own_sc[k][0])
                         & (own_sc[j][0] >= 0))
        own_keep.append((own_sc[k][0] >= 0) & ~acc)
    def u32_at_p(vec_i32):
        # all hash lanes are int32 bit-patterns; masked sum extracts at p
        return jnp.sum(jnp.where(at_p, vec_i32, 0))

    zp0 = u32_at_p(zme0)
    zp1 = u32_at_p(zme1)
    nx0, nx1 = zp0, zp1
    for k in range(4):
        # aggregate of own neighbor chain k (scalar via masked extraction)
        cx0_k = u32_at_p(nbr[k][3])
        cx1_k = u32_at_p(nbr[k][4])
        kf = own_keep[k]
        nx0 = nx0 ^ jnp.where(kf, cx0_k, 0)
        nx1 = nx1 ^ jnp.where(kf, cx1_k, 0)

    cxp0_2 = jnp.where(mem_eff | atp_eff, nx0,
                       jnp.where(cap_eff, 0, cxp0))
    cxp1_2 = jnp.where(mem_eff | atp_eff, nx1,
                       jnp.where(cap_eff, 0, cxp1))

    # post-move hash = the candidate hash at p
    hp0 = u32_at_p(hc0)
    hp1 = u32_at_p(hc1)
    h0_2 = jnp.where(placing, hp0, h0)
    h1_2 = jnp.where(placing, hp1, h1)

    slot = jnp.remainder(placed, RING)
    slot_mask = (jax.lax.broadcasted_iota(jnp.int32, (1, RING), 1) == slot) \
        & placing
    hist0_2 = jnp.where(slot_mask, h0_2, hist0)
    hist1_2 = jnp.where(slot_mask, h1_2, hist1)

    frozen = done > 0
    new_done = jnp.where(frozen, 1,
                         jnp.where(is_pass & (pass_count + 1 >= 2), 1, 0))

    def freeze(new, old):
        return jnp.where(frozen, old, new)

    stones_o[0, 0:1, :] = freeze(stones2, stones)
    cid_o[0, 0:1, :] = freeze(cid2, cid)
    cxp_o[0, 0:1, :] = freeze(cxp0_2, cxp0)
    cxp_o[0, 1:2, :] = freeze(cxp1_2, cxp1)
    hist_o[0, 0:1, :RING] = freeze(hist0_2, hist0)
    hist_o[0, 1:2, :RING] = freeze(hist1_2, hist1)
    hist_o[0, 0:1, RING:] = hist_ref[0, 0:1, RING:]
    hist_o[0, 1:2, RING:] = hist_ref[0, 1:2, RING:]
    meta_o[0, 0, 0] = freeze(opp, to_move)
    meta_o[0, 0, 1] = freeze(placed + placing.astype(jnp.int32), placed)
    meta_o[0, 0, 2] = freeze(move_count + 1, move_count)
    meta_o[0, 0, 3] = freeze(jnp.where(is_pass, pass_count + 1, 0),
                             pass_count)
    meta_o[0, 0, 4] = new_done
    meta_o[0, 0, 5] = freeze(jnp.where(is_pass, meta_ref[0, 0, 5], p),
                             meta_ref[0, 0, 5])
    meta_o[0, 0, 6] = freeze(
        jnp.where(is_pass, meta_ref[0, 0, 6], meta_ref[0, 0, 5]),
        meta_ref[0, 0, 6])
    meta_o[0, 0, 7] = meta_ref[0, 0, 7]
    hash_o[0, 0, 0] = freeze(h0_2, h0)
    hash_o[0, 0, 1] = freeze(h1_2, h1)
    for w in range(2, 8):
        hash_o[0, 0, w] = hash_ref[0, 0, w]
    move_o[0, 0, 0] = jnp.where(frozen | is_pass, jnp.int32(NN), p)
    for w in range(1, 8):
        move_o[0, 0, w] = 0


# ---------------------------------------------------------------------------
# packing between GoState and the kernel layout


def pack_states(states: goe.GoState):
    """Batched GoState -> kernel state arrays."""
    b = states.stones.shape[0]
    pad = lambda x, fill: jnp.concatenate(
        [x, jnp.full((b, NP - x.shape[1]), fill, x.dtype)], axis=1)
    stones = pad(states.stones.astype(jnp.int32), 0)
    cid = pad(states.chain_id, 0)
    # chain_xor is maintained per point already (see go/engine.py)
    cx = jnp.where((states.stones != 0)[..., None], states.chain_xor, 0)
    cxp = jnp.concatenate(
        [cx, jnp.zeros((b, NP - NN, 2), jnp.uint32)], axis=1)  # [B, NP, 2]
    cxp = jax.lax.bitcast_convert_type(
        jnp.transpose(cxp, (0, 2, 1)), jnp.int32)          # [B, 2, NP]
    hist = jnp.transpose(states.hash_hist, (0, 2, 1))      # [B, 2, RING]
    hist = jax.lax.bitcast_convert_type(jnp.concatenate(
        [hist, jnp.zeros((b, 2, 128 - RING), jnp.uint32)], axis=2),
        jnp.int32)
    meta = jnp.stack([
        states.to_move.astype(jnp.int32), states.placed_count,
        states.move_count, states.pass_count, states.done.astype(jnp.int32),
        states.last_two[:, 0], states.last_two[:, 1],
        jnp.zeros_like(states.move_count)], axis=1)[:, None, :]  # [B,1,8]
    hashw = jax.lax.bitcast_convert_type(jnp.concatenate(
        [states.hash, jnp.zeros((b, 6), jnp.uint32)], axis=1),
        jnp.int32)[:, None, :]
    return stones[:, None, :], cid[:, None, :], cxp, hist, meta, hashw


def unpack_states(template: goe.GoState, stones, cid, cxp, hist, meta,
                  hashw) -> goe.GoState:
    """Kernel state arrays -> batched GoState (chain_xor rebuilt per id)."""
    b = stones.shape[0]
    st = stones[:, 0, :NN].astype(jnp.int8)
    cids = cid[:, 0, :NN]
    # per-point aggregates map straight back into the state
    cx = jnp.transpose(
        jax.lax.bitcast_convert_type(cxp, jnp.uint32), (0, 2, 1))[:, :NN, :]
    return template.replace(
        stones=st,
        chain_id=cids,
        chain_xor=cx,
        to_move=meta[:, 0, 0].astype(jnp.int8),
        hash=jax.lax.bitcast_convert_type(hashw, jnp.uint32)[:, 0, :2],
        hash_hist=jnp.transpose(jax.lax.bitcast_convert_type(
            hist, jnp.uint32)[:, :, :RING], (0, 2, 1)),
        placed_count=meta[:, 0, 1],
        move_count=meta[:, 0, 2],
        pass_count=meta[:, 0, 3],
        last_two=jnp.stack([meta[:, 0, 5], meta[:, 0, 6]], axis=1),
        done=meta[:, 0, 4].astype(bool),
    )


@functools.partial(jax.jit, static_argnames=("interpret", "use_prng"))
def env_step(states: goe.GoState, weights: jax.Array, seed: jax.Array,
             interpret: bool | None = None, use_prng: bool = True,
             rng_bits: jax.Array | None = None):
    """One fused env step for the whole batch.

    ``weights``: f32[B, 361] sampling weights over points (ones = uniform
    random legal move; a game passes when no legal weighted move exists).
    Returns ``(new_states, moves[B])``.
    """
    if interpret is None:  # run anywhere: interpret on CPU (hermetic tests)
        interpret = jax.default_backend() == "cpu"
    b = states.stones.shape[0]
    packed = pack_states(states)
    consts = jnp.asarray(np.stack([
        _VALID, _MASK[1], _MASK[-1], _MASK[N], _MASK[-N],
        np.zeros(NP, bool), np.zeros(NP, bool), np.zeros(NP, bool),
    ]).astype(np.int32))                                    # [8, NP]
    zob = jnp.asarray(np.stack([
        _ZB[:, 0], _ZB[:, 1], _ZW[:, 0], _ZW[:, 1]])
        .view(np.int32))                                    # [4, NP] i32
    wpad = jnp.concatenate(
        [weights, jnp.zeros((b, NP - NN), weights.dtype)],
        axis=1)[:, None, :]

    specs_in = [
        pl.BlockSpec((8, NP), lambda i, s: (0, 0),
                     memory_space=pltpu.VMEM),              # consts
        pl.BlockSpec((4, NP), lambda i, s: (0, 0),
                     memory_space=pltpu.VMEM),              # zobrist
        pl.BlockSpec((1, 1, NP), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.VMEM),              # stones
        pl.BlockSpec((1, 1, NP), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.VMEM),              # cid
        pl.BlockSpec((1, 2, NP), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.VMEM),              # cxp
        pl.BlockSpec((1, 2, 128), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.VMEM),              # hist
        pl.BlockSpec((1, 1, 8), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.SMEM),              # meta
        pl.BlockSpec((1, 1, 8), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.SMEM),              # hash
        pl.BlockSpec((1, 1, NP), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.VMEM),              # weights
        pl.BlockSpec((1, 1, NP), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.VMEM),              # rng bits
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((b, 1, NP), jnp.int32),
        jax.ShapeDtypeStruct((b, 1, NP), jnp.int32),
        jax.ShapeDtypeStruct((b, 2, NP), jnp.int32),
        jax.ShapeDtypeStruct((b, 2, 128), jnp.int32),
        jax.ShapeDtypeStruct((b, 1, 8), jnp.int32),
        jax.ShapeDtypeStruct((b, 1, 8), jnp.int32),
        jax.ShapeDtypeStruct((b, 1, 8), jnp.int32),
    ]
    specs_out = [
        pl.BlockSpec((1, 1, NP), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NP), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, NP), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, 128), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 8), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 8), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 8), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.SMEM),
    ]

    if rng_bits is None:
        rng_bits = jnp.zeros((b, NN), jnp.int32)
    rng_bits = jax.lax.bitcast_convert_type(rng_bits, jnp.int32)
    rpad = jnp.concatenate(
        [rng_bits, jnp.zeros((b, NP - rng_bits.shape[1]), jnp.int32)],
        axis=1)[:, None, :]

    outs = pl.pallas_call(
        _make_kernel(use_prng),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=specs_in,
            out_specs=specs_out,
        ),
        out_shape=out_shapes,
        input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3, 7: 4, 8: 5},
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), consts, zob, *packed, wpad, rpad)

    stones, cid, cxp, hist, meta, hashw, move = outs
    new_states = unpack_states(states, stones, cid, cxp, hist, meta, hashw)
    return new_states, move[:, 0, 0]
