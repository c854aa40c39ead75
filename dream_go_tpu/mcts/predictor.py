"""The leaf-evaluator seam: pluggable predictors.

Replaces `src/libdg_mcts/predictor.rs` + `predictors/{nn,fake,random,nan}.rs`.
A predictor is a jittable function ``feats[B,19,19,32] -> (value[B],
policy[B,362])`` where ``value`` is the to-move win rate in [0, 1] and
``policy`` is a softmax distribution (pre-masking).  Everything above the
accelerator is tested against the fake/random/NaN predictors, exactly like
the reference's device-less test strategy (`predictors/mod.rs:15-21`).

:func:`symmetrize` wraps a predictor with 8-fold symmetry averaging — the
reference's ``full_forward`` (`src/libdg_mcts/lib.rs:83-130`), where features
are evaluated under every D8 transform and the de-transformed policies and
values are averaged.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..go.topology import SYM_POLICY, SYM_POLICY_INV
from ..models import tower as T

Predictor = Callable[[jax.Array], tuple[jax.Array, jax.Array]]


def net_predictor(cfg: ModelConfig, params, batch_stats=None, *,
                  folded: bool = False, softmax_temp: float = 1.0) -> Predictor:
    """Wrap tower weights as a predictor (`predictors/nn.rs:47-109`).

    The softmax temperature divides the policy logits, mirroring the
    reference's tau-scaled dense layer (`src/libdg_nn/layers/policy_head.rs:
    46-59`).  The tanh value in [-1, 1] becomes a win rate in [0, 1].
    """
    def predict(feats: jax.Array):
        out, _ = T.apply_tower(cfg, params, batch_stats, feats,
                               train=False, folded=folded)
        policy = jax.nn.softmax(out.policy_logits / softmax_temp, axis=-1)
        value = (out.value + 1.0) * 0.5
        return value, policy

    return predict


def fake_predictor(point: int, value: float = 0.6) -> Predictor:
    """Deterministic single-point policy (`predictors/fake.rs`)."""
    def predict(feats: jax.Array):
        b = feats.shape[0]
        policy = jnp.zeros((b, 362)).at[:, point].set(1.0)
        return jnp.full((b,), value), policy

    return predict


def random_predictor(noise: float = 0.0) -> Predictor:
    """Uniform policy (`predictors/random.rs`); optional per-call jitter."""
    def predict(feats: jax.Array):
        b = feats.shape[0]
        policy = jnp.full((b, 362), 1.0 / 362.0)
        if noise:
            key = jax.random.PRNGKey(
                jnp.sum(feats.astype(jnp.float32)).astype(jnp.int32))
            policy = policy + noise * jax.random.uniform(key, (b, 362))
            policy = policy / jnp.sum(policy, axis=-1, keepdims=True)
        return jnp.full((b,), 0.5), policy

    return predict


def nan_predictor() -> Predictor:
    """All-NaN outputs for numerical-fault-path testing (`predictors/nan.rs`)."""
    def predict(feats: jax.Array):
        b = feats.shape[0]
        return jnp.full((b,), jnp.nan), jnp.full((b, 362), jnp.nan)

    return predict


_SYMP = np.asarray(SYM_POLICY)          # [8, 362]
_SYMP_INV = np.asarray(SYM_POLICY_INV)  # [8, 362]


def symmetrize(predict: Predictor) -> Predictor:
    """8-symmetry averaged evaluation (`lib.rs:83-130` full_forward).

    Features are [B,19,19,C]; each D8 transform is applied spatially, the
    predictor runs on the 8B batch, and policies are mapped back through the
    inverse transform before averaging.
    """
    def predict_sym(feats: jax.Array):
        b = feats.shape[0]
        flat = feats.reshape(b, 361, feats.shape[-1])
        stacked = jnp.stack([flat[:, _SYMP[t][:361], :] for t in range(8)])
        stacked = stacked.reshape(8 * b, 19, 19, feats.shape[-1])
        value, policy = predict(stacked)
        value = value.reshape(8, b).mean(axis=0)
        policy = policy.reshape(8, b, 362)
        # de-transform: out[i] = transformed[perm_inv[i]]
        policy = jnp.stack([policy[t][:, _SYMP_INV[t]] for t in range(8)])
        return value, policy.mean(axis=0)

    return predict_sym
