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

Host-fingerprint scoping: XLA's cache key does NOT cover the host CPU's
machine features, and the CPU backend stores AOT-compiled host executables
— loading an entry written on a different machine logs
"Machine type used for XLA:CPU compilation doesn't match ... could lead to
execution errors such as SIGILL" and can crash the process outright
(observed here when the driver host changed between rounds; the multichip
dryrun had to disable the cache entirely for this reason). Entries are
therefore stored under a per-host subdirectory keyed by the CPU
model+flags, so a host change is a clean cold miss instead of a
mismatched-AOT load. Same-host reuse (the measured 5m41s -> 2m08s repeat
``bench.py --quick``) is unaffected.

Known benign noise: same-host CPU loads can still log the mismatch error
naming ONLY ``+prefer-no-scatter``/``+prefer-no-gather`` — XLA compile-
tuning pseudo-features that appear in every compile-feature string but
never in the loader's host-feature detection, so the set comparison
"fails" without any ISA risk. A REAL cross-host mismatch (the SIGILL
case the fingerprint prevents) lists actual ISA features (avx512*, amx*).
"""

from __future__ import annotations

import hashlib
import os


def host_fingerprint() -> str:
    """Short stable digest of the host CPU identity (model + ISA flags).

    Everything that could change the validity of an XLA:CPU AOT executable
    feeds the digest; unknown/exotic hosts degrade to the platform tuple.
    """
    import platform as _platform

    parts = [_platform.system(), _platform.machine()]
    wanted = {"model name", "flags", "Features", "CPU implementer"}
    try:
        seen = set()
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in wanted and key not in seen:
                    seen.add(key)
                    parts.append(line.strip())
                if seen == wanted:
                    break
    except OSError:
        parts.append(_platform.processor())
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a durable directory.

    Returns the directory in use, or None when disabled (env opt-out or a
    jax build without the feature). Safe to call more than once and at any
    point relative to backend initialization.
    """
    if os.environ.get("TI_TPU_NO_COMPILE_CACHE"):
        return None
    base = (
        cache_dir
        or os.environ.get("TI_TPU_CACHE_DIR")
        or os.path.join(os.path.expanduser("~"), ".cache", "ti_tpu", "jax")
    )
    path = os.path.join(base, host_fingerprint())
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
