"""Persistent XLA compilation cache for CLI runs.

Every CLI process (train, sample, results, fan-out shards) retraces and
recompiles the same jitted samplers — 20-60 s per process on TPU, and the
multi-process fan-out driver (`scripts/fanout_driver.py`) pays it once PER
SHARD. JAX ships a content-addressed persistent cache keyed on the HLO +
compile options + backend version; enabling it makes every repeat
invocation hit disk instead of the compiler. The reference has no
equivalent concern (torch eager, no compile step).

Opt-out, not opt-in: the cache is a plain directory of immutable artifacts
(`TI_TPU_CACHE_DIR`, default ``~/.cache/ti_tpu/jax``) and JAX ignores
entries whose key mismatches, so the worst case is a cold miss. Set
``TI_TPU_NO_COMPILE_CACHE=1`` to disable entirely.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a durable directory.

    Returns the directory in use, or None when disabled (env opt-out or a
    jax build without the feature). Safe to call more than once and at any
    point relative to backend initialization.
    """
    if os.environ.get("TI_TPU_NO_COMPILE_CACHE"):
        return None
    path = (
        cache_dir
        or os.environ.get("TI_TPU_CACHE_DIR")
        or os.path.join(os.path.expanduser("~"), ".cache", "ti_tpu", "jax")
    )
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took meaningful compile time (default 1 s
        # skips the tiny host-side jits that would only churn the dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None  # older jax / read-only filesystem: run uncached
    return path
