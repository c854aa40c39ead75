"""Leela-zero distillation: replace value/policy labels with teacher outputs.

Parity with `contrib/trainer/dream_tf/model_fn.py:36-40` (``--lz-weights``):
when a leela-zero weight file is given, the trainer learns the teacher's
value and policy over LZ history features instead of the recorded labels
(ownership supervision is disabled — the teacher has no ownership head).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import leela_zero
from .pipeline import ExampleSource


class DistillationSource:
    """Wraps an :class:`ExampleSource` (built with ``lz_history=True``)."""

    def __init__(self, source: ExampleSource, lz_weights: dict | str):
        if isinstance(lz_weights, str):
            lz_weights = leela_zero.load_weights(lz_weights)
        self.source = source
        self.weights = lz_weights
        self._teacher = jax.jit(
            lambda lz: leela_zero.forward(self.weights, lz))

    def batches(self, num_batches: int):
        for feats, labels in self.source.batches(num_batches):
            lz = labels.pop("lz_features")
            value, policy = self._teacher(lz)
            yield feats, dict(
                labels,
                policy=policy,
                value=value,
                has_ownership=jnp.zeros_like(labels["has_ownership"]))
