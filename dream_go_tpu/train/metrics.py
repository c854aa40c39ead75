"""Training metrics logging.

Replaces the reference's TensorBoard summaries (`model_fn.py:112-183`:
losses, accuracies, per-variable norms, LR, plateau statistics) with a JSONL
metrics stream (one object per logged step) plus helpers for gradient/param
norm summaries.  ``tools/plot_metrics.py`` renders the stream; TensorBoard
users can tail the file with a converter.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


class MetricsWriter:
    def __init__(self, path: str):
        self.path = path
        self._fh = open(path, "a", buffering=1)

    def write(self, step: int, metrics: dict):
        record = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                continue
        self._fh.write(json.dumps(record) + "\n")

    def close(self):
        self._fh.close()


def norm_summaries(params, grads=None, prefix: str = "") -> dict:
    """Per-top-level-module parameter (and gradient) L2 norms
    (`model_fn.py:112-125`)."""
    out = {}
    for name, sub in params.items():
        leaves = jax.tree_util.tree_leaves(sub)
        sq = sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves)
        out[f"{prefix}norm/{name}"] = jnp.sqrt(sq)
    if grads is not None:
        out.update(norm_summaries(grads, prefix=f"{prefix}grad_"))
    return out
