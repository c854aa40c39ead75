"""Percentile-cutoff temperature sampling (vectorized `choose`).

Replaces `src/libdg_mcts/choose.rs:26-120`: drop the low-probability tail
until the kept entries cover at least ``1 - cutoff_percentile`` of the total
mass, raise the kept (renormalized) weights to ``1/temperature``, and sample.
Non-finite entries are treated as zero mass (reference skips them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def choose_weights(items: jax.Array, cutoff_percentile: float,
                   temperature: float) -> jax.Array:
    """[..., N] sampling weights after cutoff + temperature shaping."""
    x = jnp.where(jnp.isfinite(items), items, 0.0).astype(jnp.float32)
    x = jnp.maximum(x, 0.0)
    total = jnp.sum(x, axis=-1, keepdims=True)

    # threshold = smallest value among the largest entries whose cumulative
    # sum first reaches (1 - cutoff) * total  (choose.rs `percentile`)
    sorted_desc = -jnp.sort(-x, axis=-1)
    csum = jnp.cumsum(sorted_desc, axis=-1)
    reached = csum >= (1.0 - cutoff_percentile) * total
    idx = jnp.argmax(reached, axis=-1)
    threshold = jnp.take_along_axis(sorted_desc, idx[..., None], axis=-1)
    kept_total = jnp.take_along_axis(csum, idx[..., None], axis=-1)

    keep = x >= threshold
    safe_total = jnp.where(kept_total > 0, kept_total, 1.0)
    w = jnp.where(keep, (x / safe_total) ** (1.0 / temperature), 0.0)
    return w


def choose(rng: jax.Array, items: jax.Array, cutoff_percentile: float = 0.5,
           temperature: float = 1.0) -> jax.Array:
    """Sample an index per row; rows with zero kept mass return N-1 (pass
    slot by convention, matching `choose(...).unwrap_or(361)`)."""
    w = choose_weights(items, cutoff_percentile, temperature)
    zero = jnp.sum(w, axis=-1) <= 0
    logits = jnp.where(w > 0, jnp.log(jnp.maximum(w, 1e-30)), -jnp.inf)
    idx = jax.random.categorical(rng, logits, axis=-1)
    return jnp.where(zero, items.shape[-1] - 1, idx)
