"""Device-mesh parallelism: data-parallel training, chain-parallel sampling.

The reference has NO distributed execution of any kind (single
cuda-or-cpu device, SURVEY.md §2.3) — this layer is a new first-class
component, not a port. Design (per SURVEY.md §2.3/§5.8):

- a 1-D mesh over ICI with axis "data";
- training: parameters replicated, batch sharded on "data"; the mean-loss
  gradient reduction lowers to a single XLA psum over ICI (jit with
  NamedSharding in/out specs — no hand-written collectives);
- sampling: chains sharded on "data", zero communication until the host
  gathers statistics — embarrassingly parallel over chips, with
  per-chain RNG from fold_in so resharding never changes the draws;
- lane parallelism ("lanes" axis, ``lane_parallel_sampler``): the exact
  divergence's 3N tangent lanes — the dominant cost of a dlogp chain —
  shard over a second mesh axis with ONE scalar psum per divergence node
  (ops/divergence.py). This is the intra-molecule, tensor-parallel-like
  axis: it cuts single-chain LATENCY when chains-per-chip is small
  (serving / few-chain regimes), and composes with chain sharding as a
  2-D (data × lanes) mesh;
- weight-matrix TP and PP remain deliberately absent: the models are
  ≤ ~2M parameters (SURVEY.md §2.3) — sharding parameters would add ICI
  latency per layer for zero memory benefit. The axes that matter are
  chains/batch and tangent lanes.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_batch(tree, mesh: Mesh, axis_name: str = "data"):
    """Place every leaf with its leading axis split across the mesh."""
    sh = batch_sharded(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def parallel_update(update_fn: Callable, mesh: Mesh, axis_name: str = "data") -> Callable:
    """Data-parallel training step.

    ``update_fn(state, key, *batch) -> (state, loss)`` with a mean loss
    over the batch axis. Parameters/opt state replicated, batch leaves
    sharded on ``axis_name``; XLA inserts the gradient all-reduce.
    """
    repl = replicated(mesh)
    shard = batch_sharded(mesh, axis_name)
    return _jit_with_batch_shardings(update_fn, repl, shard)


def _jit_with_batch_shardings(fn, repl, shard):
    """jit wrapper that replicates the first two args (state, key) and
    shards the rest on their leading axis — avoids fixing the arity."""

    jitted = {}

    def wrapper(state, key, *batch):
        arity = len(batch)
        if arity not in jitted:
            jitted[arity] = jax.jit(
                fn,
                in_shardings=(repl, repl) + (shard,) * arity,
                out_shardings=None,
            )
        return jitted[arity](state, key, *batch)

    return wrapper


def parallel_sampler(sampler_fn: Callable, mesh: Mesh, axis_name: str = "data") -> Callable:
    """Chain-parallel sampling: shard chains across the mesh, no
    communication inside the rollout. ``sampler_fn(x0s, conds, key)``."""
    repl = replicated(mesh)
    shard = batch_sharded(mesh, axis_name)

    return jax.jit(sampler_fn, in_shardings=(shard, shard, repl), out_shardings=shard)


def lane_parallel_sampler(
    sampler_fn: Callable,
    mesh: Mesh,
    *,
    chain_axis: Optional[str] = None,
    lane_axis: str = "lanes",
) -> Callable:
    """Lane-(and optionally chain-)sharded sampling via ``jax.shard_map``.

    ``sampler_fn(x0s, conds, key) -> ODESolution`` must be built with
    ``div_axis=lane_axis`` (``sampling.drivers.make_ode_sampler``) so each
    divergence node evaluates only this device's slice of the tangent
    lanes and completes the trace with one scalar psum over ``lane_axis``
    (ops/divergence.py). With ``chain_axis`` set, chains are additionally
    split over that mesh axis — a 2-D (chains × lanes) layout where the
    lane psum rides the fast inner mesh dimension.

    Everything except the chain batch is replicated compute (the primal
    forward runs on every lane shard; it is 1 evaluation against D/n
    tangent lanes). ``check_vma=False`` because the lane slices are
    *deliberately* device-varying against the replicated primal, which
    the varying-manifest-axes checker cannot express; correctness is
    covered by the parity tests (tests/test_parallel.py).

    Note: with ``chain_axis``, per-chain PRNG keys are split per shard, so
    hutchinson draws differ from the unsharded run — exact divergence
    (the production dlogp path) is bit-identical in structure and matches
    to summation-order tolerance.
    """
    cspec = P(chain_axis) if chain_axis is not None else P()
    from ti_tpu.sampling.integrators import ODESolution

    out_specs = ODESolution(xs=cspec, dlogp=cspec, nfe=P())
    return jax.jit(
        jax.shard_map(
            sampler_fn,
            mesh=mesh,
            in_specs=(cspec, cspec, P()),
            out_specs=out_specs,
            check_vma=False,
        )
    )
