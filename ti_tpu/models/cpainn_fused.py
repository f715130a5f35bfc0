"""Fused-inference cPaiNN forward: batched, Pallas-accelerated.

A pure-function re-implementation of CPaiNN.__call__ that consumes the SAME
flax parameter tree but processes a whole chain batch at once, flattening
the (B, E) edge rows into Pallas fused-MLP calls
(ops/pallas_kernels.fused_edge_mlp / fused_mlp): all MLP intermediates stay
in VMEM instead of round-tripping (B·E, 5F) tensors through HBM — measured
~13x faster than the XLA composition for the edge pipeline at F=128.

Inference-only: the Pallas kernels define no JVP/VJP, so training and the
exact-divergence dlogp path keep using model.apply; the SDE sampler and the
velocity-only phase of the quadrature-dlogp path use this. Parity with
model.apply is asserted in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ti_tpu.models.cpainn import CPaiNN, MolGraph
from ti_tpu.models.embeddings import positional_encoding, temperature_encoding
from ti_tpu.ops.graph import EdgeTable
from ti_tpu.ops.pallas_kernels import fused_edge_mlp, fused_mlp, mlp_weights_from_flax

Array = jax.Array


def apply_fused(
    model: CPaiNN,
    params,
    x: Array,  # (B, N, 3)
    t: Array,  # (B,)
    temps: Array,  # (B, K)
    atom_ids: Array,  # (N,)
    edges: EdgeTable,
    *,
    interpret: bool = False,
    tile: int = 256,
) -> Array:
    """Batched velocity field: (B, N, 3) -> (B, N, 3)."""
    p = params["params"]
    f = model.n_features
    b, n, _ = x.shape
    e_count = edges.src.shape[0]

    def run_mlp(rows, subtree):
        return fused_mlp(rows, mlp_weights_from_flax(subtree), tile=tile, interpret=interpret)

    # spatial edge features
    r = x[:, edges.src] - x[:, edges.dst]  # (B, E, 3)
    dist = jnp.linalg.norm(r, axis=-1)
    edge_dir = r / (1.0 + dist[..., None])

    # invariant features (concatenated), then combine MLP
    e = jnp.broadcast_to(p["edge_embed"]["embedding"][edges.edge_type], (b, e_count, f))
    feats = [jnp.broadcast_to(p["atom_embed"]["embedding"][atom_ids], (b, n, f))]
    if model.conditioning == "ambient":
        for i in range(2):
            enc = temperature_encoding(temps[:, i], f, model.temp_length, model.temperatures)
            feats.append(jnp.broadcast_to(enc[:, None, :], (b, n, f)))
    elif model.conditioning == "latent":
        enc = temperature_encoding(temps[:, 0], f, model.temp_length, model.temperatures)
        feats.append(jnp.broadcast_to(enc[:, None, :], (b, n, f)))
    t_enc = positional_encoding(t, f, model.time_length)  # (B, F)
    feats.append(jnp.broadcast_to(t_enc[:, None, :], (b, n, f)))

    s = run_mlp(jnp.concatenate(feats, axis=-1).reshape(b * n, -1), p["combine"]).reshape(b, n, f)
    v = jnp.zeros((b, n, f, 3), dtype=x.dtype)

    pe = positional_encoding(dist, f, model.length_scale).reshape(b * e_count, f)

    for layer in range(model.score_layers):
        mp = p[f"message_{layer}"]
        in_rows = jnp.concatenate([s[:, edges.src], e], axis=-1).reshape(b * e_count, 2 * f)
        h = fused_edge_mlp(
            in_rows, pe,
            mlp_weights_from_flax(mp["phi"]), mlp_weights_from_flax(mp["w"]),
            tile=tile, interpret=interpret,
        ).reshape(b, e_count, 5 * f)
        gates, scale_dir, ds, de, cross_gates = jnp.split(h, 5, axis=-1)

        gated = gates[..., None] * v[:, edges.src]
        scaled_dir = scale_dir[..., None] * edge_dir[:, :, None, :]
        cross = jnp.cross(
            jnp.broadcast_to(edge_dir[:, :, None, :], v[:, edges.dst].shape), v[:, edges.dst]
        )
        msgs = scaled_dir + gated + cross_gates[..., None] * cross  # (B, E, F, 3)
        # dst-major complete graph: scatter == reshape-sum
        dv = msgs.reshape(b, n, n - 1, f, 3).sum(axis=2)
        dsn = ds.reshape(b, n, n - 1, f).sum(axis=2)
        s = s + dsn
        v = v + dv
        e = e + de

        up = p[f"update_{layer}"]
        uv = jnp.einsum("bnfc,fg->bngc", v, up["u"]["kernel"])
        vv = jnp.einsum("bnfc,fg->bngc", v, up["v"]["kernel"])
        vv_norm = jnp.linalg.norm(vv, axis=-1)
        hu = run_mlp(
            jnp.concatenate([vv_norm, s], axis=-1).reshape(b * n, 2 * f), up["mlp"]
        ).reshape(b, n, 3 * f)
        g_u, scale_sq, add_inv = jnp.split(hu, 3, axis=-1)
        v = v + g_u[..., None] * uv
        s = s + vv_norm**2 * scale_sq + add_inv

    ro = p["readout"]
    hr = run_mlp(s.reshape(b * n, f), ro["mlp"]).reshape(b, n, 2)
    gates_r = hr[..., 1:2]
    v_out = jnp.einsum("bnfc,fg->bngc", v, ro["V"]["kernel"])  # (B, N, 1, 3)
    return (gates_r[..., None] * v_out)[:, :, 0, :]


def fused_velocity_fn(model: CPaiNN, params, template: MolGraph, *, interpret: bool = False):
    """Batched drift (xs (B,N,3), t scalar, temps (B,K)) -> (B,N,3)."""

    def drift(xs, t, temps):
        tb = jnp.broadcast_to(jnp.asarray(t), (xs.shape[0],))
        return apply_fused(
            model, params, xs, tb, temps, template.atom_ids, template.edges,
            interpret=interpret,
        )

    return drift
