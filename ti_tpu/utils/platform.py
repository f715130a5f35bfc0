"""Honor an explicit JAX_PLATFORMS env pin against config-level overrides.

The driver environment's sitecustomize registers the axon (TPU tunnel)
backend at interpreter start and pins ``jax_platforms="axon,cpu"`` via
``jax.config.update`` — which silently overrides the ``JAX_PLATFORMS``
environment variable (config updates beat env-var defaults). A CLI invoked
as ``JAX_PLATFORMS=cpu python scripts/...`` would then still initialize
the tunnel backend on its first device op — running "CPU" work on the TPU
when the tunnel is healthy, and hanging outright when it stalls (the
backend-init stall documented in CLAUDE.md).

``honor_env_platforms`` restores the env var's meaning for explicit
non-TPU pins. It runs at ``ti_tpu`` import, i.e. after sitecustomize but
before any device use in every CLI/script of this repo, and config updates
are last-write-wins until backends initialize — so the re-assert makes the
pin effective. Pins that include tpu/axon are left alone: for those the
sitecustomize config ("axon,cpu") is already what the user wants.
"""

from __future__ import annotations

import os


def honor_env_platforms() -> None:
    plats = os.environ.get("JAX_PLATFORMS", "")
    if not plats or "axon" in plats or "tpu" in plats:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plats)
    except Exception:
        # Best-effort: backends may already be initialized by the caller
        # (who then also controlled the platform), or jax may predate the
        # option — the env-var default still governs in fresh processes.
        pass
