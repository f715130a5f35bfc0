"""Dense (N×N) pair formulation of the cPaiNN forward — gather-free.

Mathematically identical to CPaiNN.__call__ on the complete graph, but the
edge list is replaced by the full (dst=i, src=j) pair grid:

- gathers (``s[src]``, ``v[src]``, ``v[dst]``) become broadcasts;
- the three (E, F, 3) message tensors become masked einsum CONTRACTIONS:
    dv_gates[i]  = Σ_j gates[i,j,f] · v[j,f,:]        (batched matmul)
    dv_dir[i]    = Σ_j scale[i,j,f] · dir[i,j,:]
    dv_cross[i]  = (Σ_j cg[i,j,f] · dir[i,j,:]) × v[i,f,:]
  — the cross term collapses to ONE contraction because the reference
  contracts the edge direction with the DST node's equivariant features
  (cpainn.py:299-301), which are constant over j;
- the diagonal (i == j) is masked out of every aggregation, replacing the
  "all pairs except self" edge table.

Pure XLA and differentiable — unlike the Pallas fused path this also serves
the divergence/dlogp tangent computations. Consumes the SAME flax parameter
tree as CPaiNN; parity is asserted in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ti_tpu.models.cpainn import CPaiNN, MolGraph
from ti_tpu.models.embeddings import positional_encoding, temperature_encoding
from ti_tpu.ops.graph import EdgeTable
from ti_tpu.ops.pallas_kernels import _mlp_block, mlp_weights_from_flax

Array = jax.Array


def dense_edge_type_matrix(edges: EdgeTable) -> np.ndarray:
    """(N, N) int32 with [dst, src] = edge type (diagonal 0, unused)."""
    n = edges.n_nodes
    mat = np.zeros((n, n), dtype=np.int32)
    mat[np.asarray(edges.dst), np.asarray(edges.src)] = np.asarray(edges.edge_type)
    return mat


def apply_dense(
    model: CPaiNN,
    params,
    x: Array,  # (B, N, 3)
    t: Array,  # (B,)
    temps: Array,  # (B, K)
    atom_ids: Array,  # (N,)
    edges: EdgeTable,
    *,
    fused: bool = False,
    tile: int = 128,
    interpret: bool = False,
    compute_dtype=None,
    remat_ln: bool = False,
) -> Array:
    """Batched velocity field, dense-pair layout: (B, N, 3) -> (B, N, 3).

    ``fused=True`` routes the per-pair message MLPs through the Pallas
    fused kernel with its custom-JVP tangent kernel
    (ops/pallas_kernels.fused_edge_mlp_diff): forward AND the exact-
    divergence tangent lanes keep all MLP intermediates in VMEM. Forward-
    mode only — reverse-mode (training) must use fused=False.

    ``compute_dtype=jnp.bfloat16`` runs the pair-grid compute (MLP rows,
    message/feature tensors, einsum inputs) in bf16 with f32 dot
    accumulation; params, positions, embeddings and the returned velocity
    stay f32. This halves the HBM traffic of the (B, N, N, 5F)
    intermediates — and, because ``jax.linearize`` of this function emits
    bf16 residuals/tangents, of the 3N-lane exact-divergence pass, which is
    HBM-bound (BASELINE.md). Accuracy impact is quantified in
    tests/test_pallas_kernels.py and the physics oracles.
    """
    p = params["params"]
    f = model.n_features
    b, n, _ = x.shape
    # "bf16_agg": the aggressive tangent-lane profile — bf16 dot OUTPUTS
    # (f32 MXU accumulation) on top of the bf16-operand mixed profile
    bf16_out = compute_dtype == "bf16_agg"
    cd = jnp.bfloat16 if bf16_out else compute_dtype
    if fused and cd is not None:
        raise ValueError(
            "fused=True is incompatible with compute_dtype: the Pallas edge "
            "kernel's out_shape follows the (cast) input dtype while its body "
            "computes f32 — use one or the other"
        )

    def c(a):  # cast to the compute dtype (no-op in full precision)
        return a.astype(cd) if cd is not None else a

    def mlp(rows, subtree):
        return _mlp_block(
            c(rows), mlp_weights_from_flax(subtree), compute_dtype=cd,
            remat_ln=remat_ln, bf16_out=bf16_out,
        )

    if fused:
        from ti_tpu.ops.pallas_kernels import fused_edge_mlp_diff

        edge_pair = fused_edge_mlp_diff(tile, interpret)

        def message_mlps(in_feats, pe_rows, mp):
            rows = in_feats.reshape(b * n * n, -1)
            pes = pe_rows.reshape(b * n * n, -1)
            out = edge_pair(
                rows, pes,
                mlp_weights_from_flax(mp["phi"]), mlp_weights_from_flax(mp["w"]),
            )
            return out.reshape(b, n, n, -1)

    else:

        def message_mlps(in_feats, pe_rows, mp):
            return mlp(in_feats, mp["phi"]) * mlp(pe_rows, mp["w"])

    # pair grid: i = dst, j = src; r[i, j] = x[j] - x[i]
    r = x[:, None, :, :] - x[:, :, None, :]  # (B, N(dst), N(src), 3)
    dist = jnp.linalg.norm(r + jnp.eye(n)[None, :, :, None], axis=-1)  # keep diag finite
    dist = dist * (1.0 - jnp.eye(n))[None]
    direc = c(r / (1.0 + dist[..., None]))
    mask = c((1.0 - jnp.eye(n, dtype=x.dtype))[None, :, :, None])  # (1, N, N, 1)

    etype = jnp.asarray(dense_edge_type_matrix(edges))
    if model.cutoff is not None:
        # finite radius cutoff (see CPaiNN.cutoff): non-bonded pairs with
        # dist > cutoff drop out of every message contraction; bond pairs
        # stay active unconditionally (reference AddBondGraph + coalesce)
        active = (etype > 0)[None] | (dist <= model.cutoff)
        mask = mask * c(active[..., None].astype(x.dtype))  # (B, N, N, 1)
    e = c(jnp.broadcast_to(p["edge_embed"]["embedding"][etype], (b, n, n, f)))

    feats = [jnp.broadcast_to(p["atom_embed"]["embedding"][atom_ids], (b, n, f))]
    if model.conditioning == "ambient":
        for i in range(2):
            enc = temperature_encoding(temps[:, i], f, model.temp_length, model.temperatures)
            feats.append(jnp.broadcast_to(enc[:, None, :], (b, n, f)))
    elif model.conditioning == "latent":
        enc = temperature_encoding(temps[:, 0], f, model.temp_length, model.temperatures)
        feats.append(jnp.broadcast_to(enc[:, None, :], (b, n, f)))
    t_enc = positional_encoding(t, f, model.time_length)
    feats.append(jnp.broadcast_to(t_enc[:, None, :], (b, n, f)))

    s = c(mlp(jnp.concatenate(feats, axis=-1), p["combine"]))  # (B, N, F)
    v = jnp.zeros((b, n, f, 3), dtype=cd or x.dtype)

    pe = c(positional_encoding(dist, f, model.length_scale))  # (B, N, N, F)

    for layer in range(model.score_layers):
        mp = p[f"message_{layer}"]
        # in_features[i, j] = [s[j], e[i, j]]
        s_src = jnp.broadcast_to(s[:, None, :, :], (b, n, n, f))
        in_feats = jnp.concatenate([s_src, e], axis=-1)
        h = c(message_mlps(in_feats, pe, mp))  # (B, N, N, 5F)
        gates, scale_dir, ds, de, cg = jnp.split(h * mask, 5, axis=-1)

        dv = (
            jnp.einsum("bijf,bjfc->bifc", gates, v)
            + jnp.einsum("bijf,bijc->bifc", scale_dir, direc)
            + jnp.cross(jnp.einsum("bijf,bijc->bifc", cg, direc), v)
        )
        s = s + c(jnp.sum(ds, axis=2, dtype=jnp.float32))
        v = v + dv
        # de is diagonal-masked; off-diagonal (real-edge) updates are exact
        # and the diagonal entries are never consumed (their h rows are
        # masked every layer)
        e = e + de

        up = p[f"update_{layer}"]
        uv = jnp.einsum("bnfc,fg->bngc", v, c(up["u"]["kernel"]))
        vv = jnp.einsum("bnfc,fg->bngc", v, c(up["v"]["kernel"]))
        vv_norm = jnp.linalg.norm(vv.astype(jnp.float32), axis=-1)
        hu = mlp(jnp.concatenate([c(vv_norm), s], axis=-1), up["mlp"])  # f32 out
        g_u, scale_sq, add_inv = jnp.split(hu, 3, axis=-1)
        v = v + c(g_u)[..., None] * uv
        s = s + c(vv_norm**2 * scale_sq + add_inv)

    ro = p["readout"]
    hr = mlp(s, ro["mlp"])  # (B, N, 2)
    v_out = jnp.einsum("bnfc,fg->bngc", v, c(ro["V"]["kernel"]))
    return (hr[..., 1:2, None][:, :, 0] * v_out[:, :, 0, :].astype(jnp.float32)).astype(
        x.dtype
    )


def dense_velocity_fn(model: CPaiNN, params, template: MolGraph, compute_dtype=None):
    """Batched drift (xs (B,N,3), t scalar-or-(B,), temps (B,K)) -> (B,N,3)."""

    def drift(xs, t, temps):
        tb = jnp.broadcast_to(jnp.asarray(t), (xs.shape[0],))
        return apply_dense(
            model, params, xs, tb, temps, template.atom_ids, template.edges,
            compute_dtype=compute_dtype,
        )

    return drift
