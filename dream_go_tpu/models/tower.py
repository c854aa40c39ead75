"""Residual tower with policy / value / ownership heads (flax linen).

One model definition serves both training and inference, replacing the
reference's split between the TF trainer graph (`contrib/trainer/dream_tf/
layers/{tower,residual_block,policy_head,value_head,batch_norm}.py`) and the
hand-built cuDNN inference graph (`src/libdg_nn/graph.rs` + `layers/*.rs`).

Architecture (`tower.py:31-71`, defaults `__main__.py:154-156`):
- 3x3 conv (num_features -> C) + BN + ReLU                  ("01_upsample")
- num_blocks x gated residual blocks: BN-conv+relu, BN-conv, then
  ``relu(alpha * y + (1 - alpha) * x)`` with a learnable scalar
  ``alpha`` clipped to [0, 1] (`residual_block.py:45-57`)
- policy head: 3x3 conv (C -> num_samples) + BN + ReLU, dense 361*s -> 362
  logits (`policy_head.py:29-55`)
- value head: 3x3 conv (C -> 2) + BN + ReLU; value = dense 722 -> 1 -> tanh
  (bias init -0.00502319782, `value_head.py:62`); ownership = 1x1 conv -> tanh
  per point (`value_head.py:46-56`)

Batch norm matches the reference exactly: fixed scale (gamma == 1,
non-trainable), trainable offset, running stats updated with rate 0.01
(`batch_norm.py:89-95`), epsilon 0.001.  ``folded=True`` builds the
inference-time variant where BN is folded into conv bias (see
`models/params.py`), which is also what the weights-JSON export produces
(`batch_norm.py:47-74`).

Compute runs in bf16 on the MXU with fp32 parameters; the heads' outputs are
cast back to fp32.  NHWC layout throughout (TPU-native for convolutions).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig


@dataclasses.dataclass
class TowerOutput:
    policy_logits: jax.Array   # [B, 362] fp32
    value: jax.Array           # [B] fp32 in [-1, 1]
    ownership: jax.Array       # [B, 361] fp32 in [-1, 1]


class BNConv(nn.Module):
    """3x3 (or given-size) conv + reference-style batch norm + optional relu.

    With ``folded=True`` the BN is replaced by a plain bias, matching the
    dumped inference graph (`src/libdg_nn/layers/conv2d.rs` fused conv-bias).
    """

    features: int
    kernel: tuple[int, int] = (3, 3)
    folded: bool = False
    relu: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, self.kernel, padding="SAME",
            use_bias=self.folded,
            kernel_init=nn.initializers.orthogonal(),
            dtype=self.dtype, param_dtype=jnp.float32,
            name="conv")(x)
        if not self.folded:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99, epsilon=1e-3,
                use_scale=False, use_bias=True,
                dtype=self.dtype, param_dtype=jnp.float32,
                name="bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class ResidualBlock(nn.Module):
    features: int
    folded: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = BNConv(self.features, folded=self.folded, dtype=self.dtype,
                   name="conv_1")(x, train)
        y = BNConv(self.features, folded=self.folded, relu=False,
                   dtype=self.dtype, name="conv_2")(y, train)
        alpha = self.param("alpha", nn.initializers.constant(0.5), ())
        alpha = jnp.clip(alpha, 0.0, 1.0).astype(self.dtype)
        return nn.relu(alpha * y + (1.0 - alpha) * x.astype(self.dtype))


class PolicyHead(nn.Module):
    num_samples: int
    folded: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = BNConv(self.num_samples, folded=self.folded, dtype=self.dtype,
                   name="conv_1")(x, train)
        y = y.reshape(y.shape[0], -1)  # [B, 361 * num_samples]
        y = nn.Dense(362, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=nn.initializers.orthogonal(),
                     name="linear_1")(y)
        return y.astype(jnp.float32)


class ValueHead(nn.Module):
    folded: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = BNConv(2, folded=self.folded, dtype=self.dtype,
                   name="conv_1")(x, train)
        ownership = nn.Conv(
            1, (1, 1), use_bias=True,
            kernel_init=nn.initializers.orthogonal(),
            dtype=self.dtype, param_dtype=jnp.float32,
            name="conv_2")(y)
        ownership = jnp.tanh(ownership.reshape(ownership.shape[0], 361)
                             .astype(jnp.float32))
        z = y.reshape(y.shape[0], -1)  # [B, 722]
        z = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=nn.initializers.orthogonal(),
                     bias_init=nn.initializers.constant(-0.00502319782),
                     name="linear_2")(z)
        value = jnp.tanh(z.reshape(z.shape[0]).astype(jnp.float32))
        return value, ownership


class Tower(nn.Module):
    """The full network.  Call returns a :class:`TowerOutput`."""

    cfg: ModelConfig = ModelConfig()
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> TowerOutput:
        dtype = jnp.dtype(self.cfg.compute_dtype)
        x = x.astype(dtype)
        x = BNConv(self.cfg.num_channels, folded=self.folded, dtype=dtype,
                   name="upsample")(x, train)
        block = ResidualBlock
        if self.cfg.remat and train:
            # activation recomputation (reference recompute_grad.py:25-56):
            # per-block checkpointing trades FLOPs for HBM on deep towers
            block = nn.remat(ResidualBlock, static_argnums=(2,))
        for i in range(self.cfg.num_blocks):
            x = block(self.cfg.num_channels, folded=self.folded,
                      dtype=dtype, name=f"residual_{i:02d}")(x, train)
        policy = PolicyHead(self.cfg.num_samples, folded=self.folded,
                            dtype=dtype, name="policy")(x, train)
        value, ownership = ValueHead(folded=self.folded, dtype=dtype,
                                     name="value")(x, train)
        return TowerOutput(policy_logits=policy, value=value,
                           ownership=ownership)


def init_tower(cfg: ModelConfig, rng: jax.Array, folded: bool = False):
    """Initialize (params, batch_stats) for the tower."""
    model = Tower(cfg, folded=folded)
    variables = model.init(rng, jnp.zeros((1, 19, 19, cfg.num_features)),
                           train=False)
    return variables.get("params"), variables.get("batch_stats", {})


def apply_tower(cfg: ModelConfig, params, batch_stats, x, *,
                train: bool = False, folded: bool = False,
                mutable: bool = False):
    """Forward pass; returns (TowerOutput, new_batch_stats | None)."""
    model = Tower(cfg, folded=folded)
    variables = {"params": params}
    if not folded:
        variables["batch_stats"] = batch_stats
    if train and not folded:
        out, updates = model.apply(variables, x, train=True,
                                   mutable=["batch_stats"])
        return out, updates["batch_stats"]
    return model.apply(variables, x, train=False), None
