"""cPaiNN — chirality-aware SE(3)-equivariant velocity field, TPU-native.

Re-design of the reference cPaiNN GNN (mdqm9/thermo/ambient/models/cpainn.py
and its near-identical latent copy mdqm9/thermo/latent/models/cpainn.py),
unified into ONE parameterized model instead of two duplicated trees:

- ``conditioning="ambient"``: dual (T0, T1) temperature embeddings + time
  (cpainn.py:67-90) — used by the T0→T1 transport model.
- ``conditioning="latent"``: single T embedding + time
  (latent/models/cpainn.py:43-60) — the multi-temperature Boltzmann generator.
- ``conditioning="none"``: time only (latent/models/cpainn.py:61-72) — the
  single-temperature generator.

TPU-first structural changes (behavior preserved):
- No PyG batch mutation: the model is a pure function of a single molecule's
  (x, atom_ids, t, temps) plus a *static* complete-graph EdgeTable
  (ops/graph.py); batching is jax.vmap over molecules/chains.
- ``torch_scatter.scatter`` edge→node sums (cpainn.py:303-304) become dense
  reshape-sums on the dst-major complete graph (ops.graph.edge_aggregate).
- All shapes static ⇒ the whole network jits once and fuses into large
  batched matmuls on the MXU.

Reference quirks kept for parity (documented):
- edge_dir = r / (1 + |r|), NOT normalized (models/graph.py:30-31).
- The cross-product term contracts edge_dir with the equivariant features of
  the *destination* node (variable named src_... but indexed with dst_node,
  cpainn.py:299-301).
- LayerReadout overwrites (not residual-adds) node features (cpainn.py:430-444).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ti_tpu.models.embeddings import MLP, positional_encoding, temperature_encoding
from ti_tpu.ops.graph import EdgeTable, edge_aggregate

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MolGraph:
    """A single molecule's model input (batching = vmap over this).

    x: (N, 3) atom positions. atom_ids: (N,) int32 (positional ids
    ``arange(N)`` for the "distinguish" mode both pipelines use,
    mdqm9/data/mdqm9_ambient.py:222-229). t: scalar time in [0, 1].
    temps: (n_temp_cond,) conditioning temperatures — (T0, T1) for ambient,
    (T,) for latent, () for single-temperature.
    """

    x: Array
    atom_ids: Array
    t: Array
    temps: Array
    edges: EdgeTable

    def with_x_t(self, x: Array, t: Array) -> "MolGraph":
        return dataclasses.replace(self, x=x, t=jnp.asarray(t))


class EquivariantLinear(nn.Module):
    """Channel-mixing linear (no bias) over (N, F, 3) feature axis.

    Reference EquivariantLinear (cpainn.py:379-403): Linear applied to the
    channel axis with the vector axis untouched.
    """

    features_out: int

    @nn.compact
    def __call__(self, v: Array) -> Array:  # (N, F, 3) -> (N, F_out, 3)
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (v.shape[-2], self.features_out),
            v.dtype,
        )
        return jnp.einsum("...fc,fg->...gc", v, w)


class SE3Message(nn.Module):
    """Chirality-aware PaiNN message (reference SE3Message, cpainn.py:233-307).

    ``edge_mask`` (E, 1), if given, zeroes the full MLP output row of
    inactive edges before any aggregation/update — exactly equivalent to
    those edges being absent from the graph (their ``e`` rows still carry
    values but every consumer of them is re-masked each layer).
    """

    n_features: int
    length_scale: float = 10.0
    dtype: Any = None

    @nn.compact
    def __call__(
        self, s: Array, v: Array, e: Array, edge_dist: Array, edge_dir: Array, edges: EdgeTable,
        edge_mask: Optional[Array] = None,
    ) -> Tuple[Array, Array, Array]:
        f = self.n_features
        in_features = jnp.concatenate([s[edges.src], e], axis=-1)  # (E, 2F)
        pe = positional_encoding(edge_dist, f, self.length_scale)  # (E, F)
        h = MLP(f, 5 * f, name="phi", dtype=self.dtype)(in_features) * MLP(
            f, 5 * f, name="w", dtype=self.dtype
        )(pe)
        if edge_mask is not None:
            h = h * edge_mask.astype(h.dtype)
        gates, scale_edge_dir, ds, de, cross_gates = jnp.split(h, 5, axis=-1)

        gated = gates[..., None] * v[edges.src]  # (E, F, 3)
        scaled_dir = scale_edge_dir[..., None] * edge_dir[:, None, :]  # (E, F, 3)
        # reference quirk: cross product uses the DST node's equivariant
        # features (cpainn.py:299-301)
        cross = jnp.cross(
            jnp.broadcast_to(edge_dir[:, None, :], v[edges.dst].shape), v[edges.dst]
        )
        gated_cross = cross_gates[..., None] * cross

        dv = edge_aggregate(scaled_dir + gated + gated_cross, edges)  # (N, F, 3)
        dsn = edge_aggregate(ds, edges)  # (N, F)
        return s + dsn, v + dv, e + de


class Update(nn.Module):
    """PaiNN node update (reference Update, cpainn.py:318-376)."""

    n_features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, s: Array, v: Array) -> Tuple[Array, Array]:
        f = self.n_features
        uv = EquivariantLinear(f, name="u")(v)
        vv = EquivariantLinear(f, name="v")(v)
        vv_norm = jnp.linalg.norm(vv, axis=-1)  # (N, F)
        h = MLP(f, 3 * f, name="mlp", dtype=self.dtype)(jnp.concatenate([vv_norm, s], axis=-1))
        gates, scale_sq, add_inv = jnp.split(h, 3, axis=-1)
        delta_v = gates[..., None] * uv
        delta_s = vv_norm**2 * scale_sq + add_inv
        return s + delta_s, v + delta_v


class LayerReadout(nn.Module):
    """Gated equivariant readout (reference LayerReadout, cpainn.py:406-444)."""

    n_features: int
    n_features_out: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, s: Array, v: Array) -> Tuple[Array, Array]:
        h = MLP(self.n_features, 2 * self.n_features_out, name="mlp", dtype=self.dtype)(s)
        s_out, gates = jnp.split(h, 2, axis=-1)
        v_out = EquivariantLinear(self.n_features_out, name="V")(v)
        return s_out, gates[..., None] * v_out


class CPaiNN(nn.Module):
    """Unified ambient/latent cPaiNN velocity field for one molecule.

    Output: (N, 3) per-atom velocity (the reference's
    ``batch.equivariant_node_features.squeeze()``, cpainn.py:112-115).
    """

    n_features: int = 128
    score_layers: int = 5
    # Atom-id vocabulary. The reference defaults to 25 (cpainn.py:28) and
    # never overrides it, but both pipelines use POSITIONAL atom ids
    # (arange(n_atoms), mdqm9_ambient.py:219-220) — for a molecule with
    # more than 25 atoms (QM9 goes up to 29) torch.nn.Embedding would
    # crash with an IndexError, and flax's nn.Embed silently returns NaN
    # (jnp.take fills out-of-bounds gathers). None (default) sizes the
    # table as max(25, n_atoms) from the input graph: identical parameter
    # shapes to the reference for every molecule the reference can run,
    # and correct instead of NaN beyond 25 atoms.
    n_types: Optional[int] = None
    n_edge_types: int = 4
    temp_length: float = 100.0
    time_length: float = 10.0
    length_scale: float = 10.0
    temperatures: Tuple[float, ...] = (300.0, 400.0, 500.0, 600.0, 700.0, 800.0, 900.0, 1000.0)
    conditioning: str = "ambient"  # "ambient" | "latent" | "none"
    # Finite radius-graph cutoff (the reference's `cutoff` config key,
    # mdqm9/thermo/utils.py:112-125): a non-bonded edge participates only
    # while |x_src - x_dst| <= cutoff; bond edges are always active
    # (AddBondGraph is unconditional, coalesce reduce="max"). None = the
    # complete graph — every reference production config uses cutoff=1000,
    # which can never exclude an edge on these molecules, so the masking is
    # skipped entirely. Shapes stay static: the complete-graph edge table is
    # kept and inactive edges are MASKED per evaluation. NOTE a deliberate
    # semantic refinement: the reference builds its radius graph once per
    # data item from the item's stored positions (mdqm9_ambient.py:104-107)
    # and keeps that edge set frozen along the ODE trajectory (reset_batch
    # touches only x and t, ode_wrapper.py:94-113); we evaluate the cutoff
    # against the CURRENT positions each forward — identical during
    # training (the graph is built from the same x the forward sees),
    # continuous instead of frozen during sampling.
    cutoff: Optional[float] = None
    # compute/activation dtype for the MLP stacks (params stay f32);
    # jnp.bfloat16 roughly doubles sampling throughput on v5e (the path is
    # HBM-bandwidth-bound). Geometry (edge vectors, norms, cross products)
    # and the output stay f32.
    dtype: Any = None

    @nn.compact
    def __call__(self, g: MolGraph) -> Array:
        f = self.n_features
        n = g.edges.n_nodes
        x = g.x

        # spatial edge features (reference AddSpatialFeatures, models/graph.py:12-34)
        r = x[g.edges.src] - x[g.edges.dst]
        edge_dist = jnp.linalg.norm(r, axis=-1)
        edge_dir = r / (1.0 + edge_dist[..., None])

        edge_mask = None
        if self.cutoff is not None:
            edge_mask = (
                (g.edges.edge_type > 0) | (edge_dist <= self.cutoff)
            ).astype(x.dtype)[:, None]

        # invariant features accumulate by concatenation (embedding.py:68-86)
        e = nn.Embed(self.n_edge_types, f, name="edge_embed")(g.edges.edge_type)
        n_types = self.n_types if self.n_types is not None else max(25, n)
        feats = [nn.Embed(n_types, f, name="atom_embed")(g.atom_ids)]

        t_node = jnp.broadcast_to(jnp.asarray(g.t), (n,))
        if self.conditioning == "ambient":
            for i in range(2):  # T0 then T1
                T_node = jnp.broadcast_to(g.temps[i], (n,))
                feats.append(
                    temperature_encoding(T_node, f, self.temp_length, self.temperatures)
                )
        elif self.conditioning == "latent":
            T_node = jnp.broadcast_to(g.temps[0], (n,))
            feats.append(temperature_encoding(T_node, f, self.temp_length, self.temperatures))
        elif self.conditioning != "none":
            raise ValueError(f"unknown conditioning {self.conditioning!r}")
        feats.append(positional_encoding(t_node, f, self.time_length))

        s = MLP(f, f, name="combine", dtype=self.dtype)(jnp.concatenate(feats, axis=-1))
        v = jnp.zeros((n, f, 3), dtype=x.dtype)

        for i in range(self.score_layers):
            s, v, e = SE3Message(f, self.length_scale, name=f"message_{i}", dtype=self.dtype)(
                s, v, e, edge_dist, edge_dir, g.edges, edge_mask
            )
            s, v = Update(f, name=f"update_{i}", dtype=self.dtype)(s, v)

        _, v_out = LayerReadout(f, 1, name="readout", dtype=self.dtype)(s, v)  # (N, 1, 3)
        return jnp.squeeze(v_out, axis=-2).astype(x.dtype)
