"""Test harness: force an 8-device virtual CPU platform before jax imports.

Mirrors the reference's device-less test strategy (SURVEY §4): everything
above the accelerator seam runs against CPU jit, and multi-chip sharding is
exercised on a virtual 8-device host mesh.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The container's sitecustomize imports jax *before* conftest runs and
# registers the remote-TPU tunnel plugin with JAX_PLATFORMS=axon, so env vars
# alone are too late.  jax.config.update works any time before backend init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
