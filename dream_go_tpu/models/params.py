"""Parameter transforms and the ``dream_go.json`` weights format.

Replaces the reference's dump/load pair:
- dump: BN folding + HWIO->OIHW transpose + b85/f16 JSON
  (`contrib/trainer/dream_tf/layers/batch_norm.py:47-74`,
  `hooks/dump.py:34-67`)
- load: streaming JSON of ``{name: {"s": scale, "t": type, "v": data}}``
  (`src/libdg_nn/loader.rs:36-116`), with the tensor naming scheme probed by
  the graph builder (`src/libdg_nn/graph.rs:76-96`,
  `layers/residual_block.rs:41-43`, `layers/{policy,value}_head.rs`):

  ``01_upsample/conv_1``, ``{i:02}_residual/{conv_1,conv_2,alpha}`` for
  i = 2..2+blocks, ``{j:02}p_policy/{conv_1,linear_1}`` and
  ``{j:02}v_value/{conv_1,linear_2}`` at j = 2+blocks, each with a
  ``.../offset`` bias and ``:0`` suffix, plus scalar ``num_channels:0`` /
  ``num_samples:0``.

BN folding (scale is fixed at 1 in the reference, `batch_norm.py:42`):
``w' = w / sqrt(var + 1e-3)``, ``b' = offset - mean / sqrt(var + 1e-3)``.
"""

from __future__ import annotations

import json

import numpy as np

from ..config import ModelConfig
from ..utils import b85

_EPS = 1e-3


def _fold_conv(conv, bn, stats):
    """Fold reference-style BN (fixed scale) into conv kernel + bias."""
    std = np.sqrt(np.asarray(stats["var"]) + _EPS)
    kernel = np.asarray(conv["kernel"]) / std  # HWIO / per-out-channel
    bias = np.asarray(bn["bias"]) - np.asarray(stats["mean"]) / std
    return {"kernel": kernel, "bias": bias}


def fold_params(cfg: ModelConfig, params, batch_stats):
    """Training params (+ running stats) -> folded inference params.

    The result matches the variable tree of ``Tower(cfg, folded=True)``.
    """
    def fold(scope_p, scope_s):
        return _fold_conv(scope_p["conv"], scope_p["bn"], scope_s["bn"])

    out = {"upsample": {"conv": fold(params["upsample"],
                                     batch_stats["upsample"])}}
    for i in range(cfg.num_blocks):
        name = f"residual_{i:02d}"
        out[name] = {
            "conv_1": {"conv": fold(params[name]["conv_1"],
                                    batch_stats[name]["conv_1"])},
            "conv_2": {"conv": fold(params[name]["conv_2"],
                                    batch_stats[name]["conv_2"])},
            "alpha": np.clip(np.asarray(params[name]["alpha"]), 0.0, 1.0),
        }
    out["policy"] = {
        "conv_1": {"conv": fold(params["policy"]["conv_1"],
                                batch_stats["policy"]["conv_1"])},
        "linear_1": {k: np.asarray(v)
                     for k, v in params["policy"]["linear_1"].items()},
    }
    out["value"] = {
        "conv_1": {"conv": fold(params["value"]["conv_1"],
                                batch_stats["value"]["conv_1"])},
        "conv_2": {k: np.asarray(v)
                   for k, v in params["value"]["conv_2"].items()},
        "linear_2": {k: np.asarray(v)
                     for k, v in params["value"]["linear_2"].items()},
    }
    return out


def _entry(values: np.ndarray, ttype: str = "f2", scale: float = 1.0) -> dict:
    values = np.asarray(values)
    if ttype == "f2":
        payload = values.astype(np.float16)
        if payload.size % 2:  # b85 groups are 4 bytes = two f16
            payload = np.concatenate([payload.reshape(-1),
                                      np.zeros(1, np.float16)])
    elif ttype == "f4":
        payload = values.astype(np.float32)
    elif ttype == "i4":
        payload = values.astype(np.int32)
    elif ttype == "i1":
        payload = values.astype(np.int8)
    else:
        raise ValueError(f"unknown tensor type {ttype}")
    return {
        # scale is a single b85 f32, per loader.rs:53-57
        "s": b85.encode_bytes(np.float32(scale).tobytes()),
        "t": ttype,
        "v": b85.encode_bytes(payload.tobytes()),
    }


def _hwio_to_oihw(kernel: np.ndarray) -> np.ndarray:
    return np.transpose(kernel, (3, 2, 0, 1))


def dump_json(cfg: ModelConfig, params, batch_stats) -> str:
    """Serialize to the reference weights-JSON format (BN folded)."""
    folded = fold_params(cfg, params, batch_stats)
    out = {
        "num_channels:0": _entry(np.asarray([cfg.num_channels]), "i4"),
        "num_samples:0": _entry(np.asarray([cfg.num_samples]), "i4"),
        "num_blocks:0": _entry(np.asarray([cfg.num_blocks]), "i4"),
        # input contract: were ladder planes 30/31 populated in training?
        # (extra metadata; the reference loader ignores unknown names and
        # its own dumps omit it -- absent means True, i.e. reference
        # semantics where ladders are always computed)
        "ladder_features:0": _entry(
            np.asarray([int(cfg.ladder_features)]), "i4"),
    }

    def conv(name, scope):
        out[f"{name}:0"] = _entry(_hwio_to_oihw(scope["conv"]["kernel"]))
        out[f"{name}/offset:0"] = _entry(scope["conv"]["bias"])

    conv("01_upsample/conv_1", folded["upsample"])
    for i in range(cfg.num_blocks):
        src = folded[f"residual_{i:02d}"]
        conv(f"{i + 2:02d}_residual/conv_1", src["conv_1"])
        conv(f"{i + 2:02d}_residual/conv_2", src["conv_2"])
        out[f"{i + 2:02d}_residual/alpha:0"] = _entry(
            np.asarray([src["alpha"]]), "f4")
    j = cfg.num_blocks + 2
    conv(f"{j:02d}p_policy/conv_1", folded["policy"]["conv_1"])
    out[f"{j:02d}p_policy/linear_1:0"] = _entry(
        np.asarray(folded["policy"]["linear_1"]["kernel"]).T)  # [362, 361*s]
    out[f"{j:02d}p_policy/linear_1/offset:0"] = _entry(
        folded["policy"]["linear_1"]["bias"])
    conv(f"{j:02d}v_value/conv_1", folded["value"]["conv_1"])
    out[f"{j:02d}v_value/linear_2:0"] = _entry(
        np.asarray(folded["value"]["linear_2"]["kernel"]).T)  # [1, 722]
    out[f"{j:02d}v_value/linear_2/offset:0"] = _entry(
        folded["value"]["linear_2"]["bias"])
    # ownership head (training-side extra; ignored by the reference loader)
    out[f"{j:02d}v_value/conv_2:0"] = _entry(
        _hwio_to_oihw(np.asarray(folded["value"]["conv_2"]["kernel"])))
    out[f"{j:02d}v_value/conv_2/offset:0"] = _entry(
        folded["value"]["conv_2"]["bias"])
    return json.dumps(out)


def decode_entry(entry: dict) -> np.ndarray:
    """Decode one ``{"s", "t", "v"}`` weights-JSON entry to float32 values.

    Format parity with the reference loader (`loader.rs:36-116`): ``s`` is a
    single b85-encoded f32 scale, ``t`` the payload dtype tag, ``v`` the
    b85-encoded payload; float payloads are multiplied by the scale.
    """
    return _decode(entry)


def decode_raw(text: str) -> dict:
    """Decode EVERY tensor of a weights JSON into a name -> float32 array map
    (no model reassembly); used by the ``--print`` trainer procedure."""
    return {name: _decode(entry) for name, entry in json.loads(text).items()}


def _decode(entry: dict) -> np.ndarray:
    dtype = {"f2": np.float16, "f4": np.float32,
             "i4": np.int32, "i1": np.int8}[entry["t"]]
    values = b85.decode(entry["v"], dtype).astype(np.float32)
    scale = b85.decode(entry["s"], np.float32)[0]
    if entry["t"] in ("i1", "i4") and scale != 0:
        return values  # integer payloads (hyperparams) are unscaled
    return values * (scale if scale != 0 else 1.0)


def load_json(text: str):
    """Parse a weights JSON into (ModelConfig, folded params tree)."""
    raw = json.loads(text)
    num_channels = int(_decode(raw["num_channels:0"])[0])
    num_samples = int(_decode(raw["num_samples:0"])[0])
    # count residual layers by probing names, like graph.rs:76-96
    num_blocks = 0
    while f"{num_blocks + 2:02d}_residual/conv_1:0" in raw:
        num_blocks += 1
    ladders = ("ladder_features:0" not in raw
               or bool(int(_decode(raw["ladder_features:0"])[0])))
    cfg = ModelConfig(num_channels=num_channels, num_blocks=num_blocks,
                      num_samples=num_samples, ladder_features=ladders)

    def conv(name, out_c, in_c, kh=3, kw=3):
        k = _decode(raw[f"{name}:0"])[: out_c * in_c * kh * kw]
        k = k.reshape(out_c, in_c, kh, kw).transpose(2, 3, 1, 0)  # -> HWIO
        b = _decode(raw[f"{name}/offset:0"])[:out_c]
        return {"conv": {"kernel": k, "bias": b}}

    c, s = cfg.num_channels, cfg.num_samples
    params = {"upsample": conv("01_upsample/conv_1", c, cfg.num_features)}
    for i in range(num_blocks):
        params[f"residual_{i:02d}"] = {
            "conv_1": conv(f"{i + 2:02d}_residual/conv_1", c, c),
            "conv_2": conv(f"{i + 2:02d}_residual/conv_2", c, c),
            "alpha": _decode(raw[f"{i + 2:02d}_residual/alpha:0"])[0],
        }
    j = num_blocks + 2
    pol_k = _decode(raw[f"{j:02d}p_policy/linear_1:0"])[: 362 * 361 * s]
    params["policy"] = {
        "conv_1": conv(f"{j:02d}p_policy/conv_1", s, c),
        "linear_1": {
            "kernel": pol_k.reshape(362, 361 * s).T,
            "bias": _decode(raw[f"{j:02d}p_policy/linear_1/offset:0"])[:362],
        },
    }
    val_k = _decode(raw[f"{j:02d}v_value/linear_2:0"])[: 722]
    params["value"] = {
        "conv_1": conv(f"{j:02d}v_value/conv_1", 2, c),
        "linear_2": {
            "kernel": val_k.reshape(1, 722).T,
            "bias": _decode(raw[f"{j:02d}v_value/linear_2/offset:0"])[:1],
        },
    }
    if f"{j:02d}v_value/conv_2:0" in raw:
        params["value"]["conv_2"] = {
            "kernel": _decode(raw[f"{j:02d}v_value/conv_2:0"])[:2]
            .reshape(1, 2, 1, 1).transpose(2, 3, 1, 0),
            "bias": _decode(raw[f"{j:02d}v_value/conv_2/offset:0"])[:1],
        }
    else:  # reference dumps lack the ownership head; identity-ish default
        params["value"]["conv_2"] = {
            "kernel": np.zeros((1, 1, 2, 1), np.float32),
            "bias": np.zeros(1, np.float32),
        }
    return cfg, params
