"""Test configuration: force local CPU with 8 virtual devices.

The driver environment registers a remote TPU backend (axon, with remote
compilation) via sitecustomize and pins ``jax_platforms`` through
``jax.config`` — so the env var alone is not enough; we must override the
config after importing jax. Multi-chip sharding is validated on the virtual
CPU mesh; the driver separately dry-run-compiles the multi-chip path via
__graft_entry__.dryrun_multichip, and bench.py runs on the real TPU chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
