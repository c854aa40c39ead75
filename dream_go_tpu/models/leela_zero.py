"""Leela-zero teacher network: weight-file loader + forward pass.

Replaces `contrib/trainer/dream_tf/layers/leela_zero.py:24-176`: builds a
frozen leela-zero network from the public LZ text weight format and provides
teacher (value, policy) predictions over 18-plane LZ history features for
distillation (`model_fn.py:36-40` replaces the value/policy labels).

Weight format (public leela-zero v1): a version line, then one line of
space-separated floats per tensor:

- input conv: weights [C,18,3,3] (OIHW flat), bias, bn_mean, bn_var
- per residual block, two convs x (weights, bias, bn_mean, bn_var)
- policy head: 1x1 conv (2 ch) + bn, then FC [2*361 -> 362] + bias
- value head: 1x1 conv (1 ch) + bn, then FC [361 -> 256] + bias,
  FC [256 -> 1] + bias

The number of blocks/channels is inferred from the line count / lengths.
BN (no scale) is folded into conv bias at load.  The file may be gzipped.
"""

from __future__ import annotations

import gzip

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-5


def _read_lines(path: str) -> list[np.ndarray]:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as fh:
        lines = [l.strip() for l in fh if l.strip()]
    version = lines[0]
    if version not in ("1", "2"):
        raise ValueError(f"unsupported leela-zero weights version {version!r}")
    return [np.asarray([float(x) for x in l.split()], np.float32)
            for l in lines[1:]]


def load_weights(path: str) -> dict:
    """Parse an LZ weight file into a dict of folded numpy tensors."""
    t = _read_lines(path)
    # header conv: weights length = C*18*9 -> channels
    channels = len(t[1])  # bias length of the input conv
    n_res_lines = len(t) - 4 - 6 - 8  # minus input conv, policy, value heads
    if n_res_lines % 8:
        raise ValueError("unexpected leela-zero weight layout")
    blocks = n_res_lines // 8

    def conv(i, out_c, in_c, k):
        w = t[i].reshape(out_c, in_c, k, k).transpose(2, 3, 1, 0)  # HWIO
        bias, mean, var = t[i + 1], t[i + 2], t[i + 3]
        std = np.sqrt(var + _EPS)
        return {"kernel": w / std, "bias": (bias - mean) / std}

    out = {"input": conv(0, channels, 18, 3), "blocks": []}
    i = 4
    for _ in range(blocks):
        out["blocks"].append((conv(i, channels, channels, 3),
                              conv(i + 4, channels, channels, 3)))
        i += 8
    out["policy_conv"] = conv(i, 2, channels, 1)
    out["policy_fc"] = {"kernel": t[i + 4].reshape(362, 2 * 361).T,
                        "bias": t[i + 5]}
    i += 6
    out["value_conv"] = conv(i, 1, channels, 1)
    out["value_fc1"] = {"kernel": t[i + 4].reshape(256, 361).T,
                        "bias": t[i + 5]}
    out["value_fc2"] = {"kernel": t[i + 6].reshape(1, 256).T,
                        "bias": t[i + 7]}
    out["channels"], out["num_blocks"] = channels, blocks
    return out


def forward(weights: dict, lz_feats: jax.Array):
    """(value[B] in [-1,1] to-move perspective, policy[B,362] softmax)."""
    def conv(x, p, k):
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(p["kernel"]),
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) \
            + jnp.asarray(p["bias"])

    x = jax.nn.relu(conv(lz_feats, weights["input"], 3))
    for c1, c2 in weights["blocks"]:
        y = jax.nn.relu(conv(x, c1, 3))
        y = conv(y, c2, 3)
        x = jax.nn.relu(x + y)

    p = jax.nn.relu(conv(x, weights["policy_conv"], 1))
    p = p.reshape(p.shape[0], -1)
    logits = p @ jnp.asarray(weights["policy_fc"]["kernel"]) \
        + jnp.asarray(weights["policy_fc"]["bias"])
    policy = jax.nn.softmax(logits, axis=-1)

    v = jax.nn.relu(conv(x, weights["value_conv"], 1))
    v = v.reshape(v.shape[0], -1)
    v = jax.nn.relu(v @ jnp.asarray(weights["value_fc1"]["kernel"])
                    + jnp.asarray(weights["value_fc1"]["bias"]))
    v = jnp.tanh(v @ jnp.asarray(weights["value_fc2"]["kernel"])
                 + jnp.asarray(weights["value_fc2"]["bias"]))
    return v.reshape(-1), policy


def save_weights(weights: dict, path: str):
    """Write LZ text format (for tests / round-tripping); BN is emitted as
    identity since the tensors are stored folded."""
    lines = ["1"]

    def conv(p, out_c):
        k = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)  # OIHW
        lines.append(" ".join(f"{x:.6g}" for x in k.reshape(-1)))
        lines.append(" ".join(f"{x:.6g}" for x in np.asarray(p["bias"])))
        lines.append(" ".join("0" for _ in range(out_c)))          # mean
        lines.append(" ".join(f"{1.0 - _EPS}" for _ in range(out_c)))  # var

    c = weights["channels"]
    conv(weights["input"], c)
    for c1, c2 in weights["blocks"]:
        conv(c1, c)
        conv(c2, c)
    conv(weights["policy_conv"], 2)
    lines.append(" ".join(
        f"{x:.6g}" for x in np.asarray(weights["policy_fc"]["kernel"]).T
        .reshape(-1)))
    lines.append(" ".join(
        f"{x:.6g}" for x in np.asarray(weights["policy_fc"]["bias"])))
    conv(weights["value_conv"], 1)
    lines.append(" ".join(
        f"{x:.6g}" for x in np.asarray(weights["value_fc1"]["kernel"]).T
        .reshape(-1)))
    lines.append(" ".join(
        f"{x:.6g}" for x in np.asarray(weights["value_fc1"]["bias"])))
    lines.append(" ".join(
        f"{x:.6g}" for x in np.asarray(weights["value_fc2"]["kernel"]).T
        .reshape(-1)))
    lines.append(" ".join(
        f"{x:.6g}" for x in np.asarray(weights["value_fc2"]["bias"])))
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def random_weights(channels: int = 8, blocks: int = 1, seed: int = 0) -> dict:
    """Small random LZ net (tests)."""
    rng = np.random.default_rng(seed)

    def conv(out_c, in_c, k):
        return {"kernel": rng.normal(0, 0.1, (k, k, in_c, out_c))
                .astype(np.float32),
                "bias": np.zeros(out_c, np.float32)}

    return {
        "input": conv(channels, 18, 3),
        "blocks": [(conv(channels, channels, 3), conv(channels, channels, 3))
                   for _ in range(blocks)],
        "policy_conv": conv(2, channels, 1),
        "policy_fc": {"kernel": rng.normal(0, 0.05, (2 * 361, 362))
                      .astype(np.float32),
                      "bias": np.zeros(362, np.float32)},
        "value_conv": conv(1, channels, 1),
        "value_fc1": {"kernel": rng.normal(0, 0.05, (361, 256))
                      .astype(np.float32),
                      "bias": np.zeros(256, np.float32)},
        "value_fc2": {"kernel": rng.normal(0, 0.05, (256, 1))
                      .astype(np.float32),
                      "bias": np.zeros(1, np.float32)},
        "channels": channels, "num_blocks": blocks,
    }
