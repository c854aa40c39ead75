"""Training losses and accuracy metrics.

Parity with `contrib/trainer/dream_tf/model_fn.py:48-78,160-183` and
`layers/value_head.py:66-76`:

- policy: softmax cross-entropy against the recorded search distribution,
  label smoothing 0.2, weight 0.12;
- value: Huber(winner, value), weight 1.0;
- ownership: per-point two-class CE with label smoothing 0.2, weight 1.0,
  masked by ``has_ownership``;
- metrics: policy top-1/3/5 accuracy, value sign accuracy, ownership sign
  accuracy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import TrainConfig


def _smooth(labels: jax.Array, smoothing: float) -> jax.Array:
    k = labels.shape[-1]
    return labels * (1.0 - smoothing) + smoothing / k


def policy_loss(logits: jax.Array, labels: jax.Array,
                smoothing: float = 0.2) -> jax.Array:
    """[B] softmax CE with label smoothing (tf.losses.softmax_cross_entropy)."""
    labels = _smooth(labels, smoothing)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(labels * logp, axis=-1)


def huber(x: jax.Array, y: jax.Array, delta: float = 1.0) -> jax.Array:
    err = jnp.abs(x - y)
    quad = jnp.minimum(err, delta)
    return 0.5 * quad * quad + delta * (err - quad)


def ownership_loss(logits: jax.Array, labels: jax.Array,
                   smoothing: float = 0.2) -> jax.Array:
    """[B] mean per-point two-class CE (`value_head.py:66-76`).

    ``labels`` in {-1, 0, +1} per point; encoded as [(1+y)/2, (1-y)/2] with
    logits [z, -z].
    """
    cat_labels = jnp.stack([(1.0 + labels) / 2.0, (1.0 - labels) / 2.0], -1)
    cat_labels = _smooth(cat_labels, smoothing)
    cat_logits = jnp.stack([logits, -logits], -1)
    logp = jax.nn.log_softmax(cat_logits, axis=-1)
    return jnp.mean(-jnp.sum(cat_labels * logp, axis=-1), axis=-1)


def total_loss(outputs, labels, cfg: TrainConfig):
    """(scalar loss, metrics dict).  ``labels`` needs keys policy[B,362],
    value[B] (+-1), ownership[B,361], has_ownership[B]."""
    lp = policy_loss(outputs.policy_logits, labels["policy"],
                     cfg.label_smoothing)
    lv = huber(labels["value"], outputs.value)
    lo = ownership_loss(outputs.ownership, labels["ownership"],
                        cfg.label_smoothing) * labels["has_ownership"]
    loss = jnp.mean(cfg.policy_coef * lp + cfg.value_coef * lv
                    + cfg.ownership_coef * lo)

    metrics = dict(
        loss=loss,
        loss_policy=jnp.mean(lp),
        loss_value=jnp.mean(lv),
        loss_ownership=jnp.mean(lo),
        **accuracy_metrics(outputs, labels),
    )
    return loss, metrics


def accuracy_metrics(outputs, labels):
    """policy top-1/3/5, value sign, ownership sign (`model_fn.py:160-183`)."""
    target = jnp.argmax(labels["policy"], axis=-1)
    ranks = jnp.argsort(-outputs.policy_logits, axis=-1)

    def topk(k):
        return jnp.mean(jnp.any(ranks[:, :k] == target[:, None], axis=-1))

    value_acc = jnp.mean(jnp.sign(outputs.value) == jnp.sign(labels["value"]))
    own_mask = labels["has_ownership"][:, None] * (labels["ownership"] != 0)
    own_acc = jnp.sum(
        (jnp.sign(outputs.ownership) == jnp.sign(labels["ownership"]))
        * own_mask) / jnp.maximum(jnp.sum(own_mask), 1.0)
    return dict(policy_top1=topk(1), policy_top3=topk(3), policy_top5=topk(5),
                value_accuracy=value_acc, ownership_accuracy=own_acc)
