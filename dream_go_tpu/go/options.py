"""Search-options policy masks: StandardSearch vs ScoringSearch.

Replaces `src/libdg_mcts/options.rs`.  ``StandardSearch`` allows every legal
move; ``ScoringSearch`` (used while rolling a game out to a scorable state,
and in policy-play before passing is allowed) additionally forbids:

- pass (`options.rs:133`),
- points inside either color's Benson eyes (`options.rs:118-124`),
- filling one's own heuristic eye: an empty point surrounded by >= 4/3
  (middle), 3/2 (edge), 2/1 (corner) own stones on the cross/diagonal
  (`options.rs:192-214`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .benson import benson
from .engine import BLACK, GoState, WHITE, _pad, legal_mask
from .topology import NBR8, NN

# classify points: corner / edge / middle (static masks)
_X = np.arange(NN) % 19
_Y = np.arange(NN) // 19
_IS_CORNER = ((_X == 0) | (_X == 18)) & ((_Y == 0) | (_Y == 18))
_IS_EDGE = (((_X == 0) | (_X == 18)) | ((_Y == 0) | (_Y == 18))) & ~_IS_CORNER
_CROSS_NEED = np.where(_IS_CORNER, 2, np.where(_IS_EDGE, 3, 4))
_DIAG_NEED = np.where(_IS_CORNER, 1, np.where(_IS_EDGE, 2, 3))


def eye_heuristic(state: GoState, color=None) -> jax.Array:
    """bool[361]: playing here would fill one's own (heuristic) eye."""
    color = state.to_move if color is None else color
    st8 = _pad(state.stones, jnp.int8(3))[NBR8]          # [361, 8]
    own = st8 == jnp.asarray(color).astype(st8.dtype)
    num_cross = jnp.sum(own[:, :4], axis=1)
    num_diag = jnp.sum(own[:, 4:], axis=1)
    return (num_cross >= _CROSS_NEED) & (num_diag >= _DIAG_NEED)


def scoring_mask(state: GoState) -> jax.Array:
    """bool[362]: ScoringSearch candidate mask (pass always False)."""
    legal = legal_mask(state)
    _, eye_b = benson(state.stones, state.chain_id, BLACK)
    _, eye_w = benson(state.stones, state.chain_id, WHITE)
    moves = legal[:NN] & ~eye_b & ~eye_w & ~eye_heuristic(state)
    return jnp.concatenate([moves, jnp.zeros(1, bool)])


def standard_mask(state: GoState) -> jax.Array:
    """bool[362]: StandardSearch candidate mask (all legal moves + pass)."""
    return legal_mask(state)
