"""Multi-host scaling: jax.distributed init + host-sharded actor/learner.

The reference has no distributed backend (SURVEY §5: cross-machine transport
is an HTTP uploader).  Here multi-host is the standard JAX recipe:

1. every host calls :func:`initialize` (coordinator address via env or args);
2. the mesh spans all hosts' devices (`parallel.mesh.make_mesh` sees the
   global device list after init);
3. self-play actors run per host on their local shard of the game batch —
   :func:`local_game_slice` gives each process its slice, and
   :func:`global_examples` assembles host-local training batches into a
   globally-sharded array for the data-parallel learner
   (`jax.make_array_from_process_local_data`), whose mean-loss gradients
   reduce over ICI/DCN via the shardings (no explicit collectives).

Single-host runs need none of this; every helper degrades to a no-op.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the jax.distributed runtime (idempotent; no-op standalone).

    Arguments default to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def local_game_slice(total_games: int) -> tuple[int, int]:
    """(start, count) of this host's shard of the global game batch."""
    n = jax.process_count()
    i = jax.process_index()
    per = total_games // n
    extra = total_games % n
    start = i * per + min(i, extra)
    count = per + (1 if i < extra else 0)
    return start, count


def global_examples(mesh: Mesh, local_feats: np.ndarray,
                    local_labels: dict) -> tuple[jax.Array, dict]:
    """Host-local example arrays -> globally data-sharded device arrays."""
    sharding = NamedSharding(mesh, P("data"))

    def up(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return up(local_feats), {k: up(v) for k, v in local_labels.items()}
