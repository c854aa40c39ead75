"""Device mesh + sharding utilities: the multi-chip scaling story.

Replaces the reference's multi-GPU round-robin (`src/libdg_mcts/predictors/
nn.rs:84-90`, `src/libdg_cuda/per_device.rs`) and its absent distributed
training (SURVEY §2.11): here scaling is a mesh-axis annotation.

- ``data`` axis: self-play games and training examples are sharded across
  chips; under ``jit`` the mean-loss gradient reduction lowers to a ``psum``
  over ICI (data-parallel learner).
- ``model`` axis: wide dense kernels (policy/value heads) can be sharded for
  tensor parallelism; at 128 channels this is head-room, not a requirement,
  but the learner step is written against the mesh so TP is a config change.

Multi-host: initialize ``jax.distributed`` and build the mesh over all
devices; per-host actor shards feed the learner via
``jax.make_array_from_process_local_data`` (no explicit collectives needed in
user code — XLA inserts them from the shardings).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, model: int = 1,
              devices=None) -> Mesh:
    """Mesh over ``(data, model)`` axes; defaults to all devices on data."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis (games / examples)."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, params):
    """Replicate everything except the big head kernels, which shard over
    ``model`` (tensor parallelism for the 361*s x 362 dense layers)."""
    def spec(path, leaf):
        keys = [getattr(k, "key", "") for k in path]
        if "linear_1" in keys and keys[-1] == "kernel" and leaf.ndim == 2:
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_states(mesh: Mesh, states):
    """Shard a batched GoState pytree over the data axis."""
    sharding = shard_batch(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), states)
