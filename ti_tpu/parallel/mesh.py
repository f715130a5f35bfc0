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
- TP/PP/SP/EP are deliberately absent: the models are ≤ ~2M parameters on
  ≤ ~30-atom molecules (SURVEY.md §2.3) — sharding them would add ICI
  latency per layer for zero memory benefit. The scaling axis that matters
  is chains/batch.
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
