"""True multi-process jax.distributed smoke: two CPU processes, one global
mesh, host-local batches assembled into a globally sharded array
(`parallel/distributed.py`).  The single-process suite covers the sharding
math; this covers the actual cross-process runtime (coordinator bring-up,
process_count/index, make_array_from_process_local_data)."""

import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
pid, port = int(sys.argv[1]), sys.argv[2]
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from dream_go_tpu.parallel import distributed as D
from dream_go_tpu.parallel.mesh import make_mesh, shard_batch

D.initialize(f"localhost:{{port}}", 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

mesh = make_mesh()
start, count = D.local_game_slice(16)
assert count == 8 and start == 8 * pid, (start, count)

feats = np.full((count, 19, 19, 4), float(pid), np.float32)
labels = {{"value": np.full((count,), float(pid), np.float32)}}
gfeats, glabels = D.global_examples(mesh, feats, labels)
assert gfeats.shape == (16, 19, 19, 4), gfeats.shape

total = jax.jit(lambda x, v: (x.mean(), v.mean()))(gfeats, glabels["value"])
print("MEAN", float(total[0]), float(total[1]), flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_global_batch(tmp_path):
    import dream_go_tpu
    repo = str(next(iter(dream_go_tpu.__path__)).rsplit("/", 1)[0])
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=repo))
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-2000:]
        outs.append(out)
    # mean of a half-0 half-1 global batch is 0.5 on every host
    for out in outs:
        assert "MEAN 0.5 0.5" in out, out
