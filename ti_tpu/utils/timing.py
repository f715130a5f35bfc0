"""Reliable device timing under the axon TPU tunnel (ROADMAP #10).

``jax.block_until_ready`` through the tunnel can acknowledge enqueue
rather than completion (measured: 20 pipelined 4096^3 matmuls "completing"
in 0.03 ms each, an impossible 4.3 PFLOP/s), and a host readback costs a
~30 ms round trip — so naive timing loops are wrong in both directions.
This module is the validated harness used by scripts/profile_divergence.py
and BASELINE.md's methodology note:

- every measurement wraps ``reps`` evaluations in a device-side
  ``lax.scan`` with a scalar accumulator (forces sequential execution,
  amortizes dispatch) and is fenced by ONE scalar host read;
- the measured round-trip latency is subtracted. Latency is the MIN of
  its probe reps and the timed loop the MIN of 3 runs (the repo's
  best-of-N convention, BASELINE.md timing note): shared-load wobble
  inflates means, and a mean-latency subtraction can exceed a small
  timed call outright. The result is floored at 0.0 (= below the
  harness's resolution).

Use ``device_time`` for jittable closures, ``Stopwatch`` for whole
sampler calls (single-shot, latency-dominated only below ~100 ms).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

_LATENCY: Optional[float] = None


def host_round_trip_latency(refresh: bool = False) -> float:
    """Measured scalar-readback latency (cached)."""
    global _LATENCY
    if _LATENCY is None or refresh:
        g = jax.jit(lambda x: x + 1.0)
        a = jnp.zeros((8, 8))
        float(jnp.sum(g(a)))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(jnp.sum(g(a)))
            best = min(best, time.perf_counter() - t0)
        _LATENCY = best
    return _LATENCY


def device_time(fn: Callable, *args, reps: int = 8) -> float:
    """Seconds per evaluation of ``fn(*args, i)`` (i = rep index, so the
    compiler cannot hoist the computation out of the loop)."""
    lat = host_round_trip_latency()

    @jax.jit
    def loop(*a):
        def body(acc, i):
            return acc + jnp.sum(fn(*a, i)), None

        acc, _ = jax.lax.scan(
            body, jnp.asarray(0.0, jnp.float32), jnp.arange(reps, dtype=jnp.float32)
        )
        return acc

    float(loop(*args))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - lat, 0.0) / reps


class Stopwatch:
    """Named single-shot stage timings with host-read fencing.

    >>> sw = Stopwatch()
    >>> with sw("rollout"):
    ...     sol = sampler(x0, conds, key)
    ...     sw.fence(sol.xs)          # scalar readback forces completion
    >>> sw.report()
    """

    def __init__(self):
        self.times: Dict[str, float] = {}
        self._name = None
        self._t0 = 0.0

    def __call__(self, name: str) -> "Stopwatch":
        self._name = name
        return self

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times[self._name] = self.times.get(self._name, 0.0) + (
            time.perf_counter() - self._t0
        )
        return False

    @staticmethod
    def fence(x) -> float:
        """Force completion of everything x depends on (one scalar read)."""
        return float(jnp.sum(jax.tree.leaves(x)[0]))

    def report(self) -> str:
        total = sum(self.times.values()) or 1.0
        lines = [
            f"{k:>24s}: {v*1e3:9.2f} ms ({100*v/total:5.1f}%)"
            for k, v in sorted(self.times.items(), key=lambda kv: -kv[1])
        ]
        return "\n".join(lines)
