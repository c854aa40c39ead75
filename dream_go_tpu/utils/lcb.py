"""Lower-confidence-bound statistics for final move selection.

Parity with `src/libdg_utils/lcb.rs:28-36`: ``normal_lcb(p_hat, p_std, n)``
returns ``p_hat - z * p_std / sqrt(n)`` where ``z`` is interpolated from a
visit-count-indexed table (the reference's ``CRITICAL_VALUE`` config schedule,
`src/libdg_utils/config.rs:194-195`).
"""

from __future__ import annotations

import jax.numpy as jnp


def normal_lcb(p_hat, p_std, n, z=1.0):
    """Mean minus z standard errors; `n` may be an array of visit counts."""
    n = jnp.maximum(n, 1)
    return p_hat - z * p_std / jnp.sqrt(n.astype(jnp.float32))
