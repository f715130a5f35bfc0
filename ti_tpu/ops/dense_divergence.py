"""Hand-propagated lane-batched JVP for the dense-pair cPaiNN divergence.

The exact divergence needs 3N tangent lanes through the full network per
evaluation (reference: 3N autograd backward passes per RHS eval,
mdqm9/thermo/ambient/models/ode_wrapper.py:60-91; our baseline:
``jax.linearize`` + vmapped basis, ops/divergence.py). This module writes
the forward-mode propagation BY HAND with the lane axis explicit:

- layer-0 input tangents (s, e) are structurally zero and skipped;
- the positional-encoding tangent factors through the scalar distance
  (d_pe = PE'(dist) * d_dist), so no per-lane encoding is materialized;
- tangent MLP matmuls run with the lane axis folded into rows;
- only the diagonal entries of the readout tangent are computed.

It is numerically identical to linearize (tested against
divergence_exact over apply_dense), serves as the reference/fallback for
the Pallas layer kernel, and is the place where the tangent computation's
memory layout is controlled explicitly.

Conventions follow models/cpainn_dense.py (dst = i, src = j,
r[i,j] = x[j] - x[i]); parameter tree is the flax CPaiNN tree.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ti_tpu.models.cpainn import CPaiNN
from ti_tpu.models.cpainn_dense import dense_edge_type_matrix
from ti_tpu.models.embeddings import positional_encoding, temperature_encoding
from ti_tpu.ops.graph import EdgeTable
from ti_tpu.ops.pallas_kernels import (
    _mlp_block,
    _mlp_block_jvp,
    mlp_weights_from_flax,
)

Array = jax.Array


def _mlp(x, subtree):
    return _mlp_block(x, mlp_weights_from_flax(subtree))


def _mlp_jvp(x, dx, subtree):
    return _mlp_block_jvp(x, dx, mlp_weights_from_flax(subtree))


def _ln_silu_residuals(h, scale, bias):
    mu = jnp.mean(h, axis=-1, keepdims=True)
    cen = h - mu
    var = jnp.mean(cen**2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    l = cen * rstd * scale + bias
    return l * jax.nn.sigmoid(l), (cen, rstd, l)


def _ln_silu_tangent(res, dh, scale):
    cen, rstd, l = res
    dmu = jnp.mean(dh, axis=-1, keepdims=True)
    drstd = -(rstd**3) * jnp.mean(cen * dh, axis=-1, keepdims=True)
    dl = ((dh - dmu) * rstd + cen * drstd) * scale
    sig = jax.nn.sigmoid(l)
    return sig * (1.0 + l * (1.0 - sig)) * dl


def _mlp_tangent_only(x, dx, subtree):
    """Tangent of the MLP with the lane axis folded into rows.

    x: (R, Fin); dx: (L, R, Fin) -> (L, R, Fout). The primal chain runs
    ONCE; its residuals broadcast over the lane axis, so the per-lane work
    is exactly the linear tangent map (matmuls on (L*R, F) rows).
    """
    w = mlp_weights_from_flax(subtree)
    l, r, f_in = dx.shape
    h1 = jnp.dot(x, w.w1, preferred_element_type=jnp.float32) + w.b1
    a1, res1 = _ln_silu_residuals(h1, w.ln1_scale, w.ln1_bias)
    h2 = jnp.dot(a1, w.w2, preferred_element_type=jnp.float32) + w.b2
    a2, res2 = _ln_silu_residuals(h2, w.ln2_scale, w.ln2_bias)

    dh1 = jnp.dot(dx.reshape(l * r, f_in), w.w1, preferred_element_type=jnp.float32)
    da1 = _ln_silu_tangent(
        tuple(jnp.broadcast_to(t[None], (l,) + t.shape).reshape(l * r, -1) for t in res1),
        dh1, w.ln1_scale,
    )
    dh2 = jnp.dot(da1, w.w2, preferred_element_type=jnp.float32)
    da2 = _ln_silu_tangent(
        tuple(jnp.broadcast_to(t[None], (l,) + t.shape).reshape(l * r, -1) for t in res2),
        dh2, w.ln2_scale,
    )
    dout = jnp.dot(da2, w.w3, preferred_element_type=jnp.float32)
    return dout.reshape(l, r, -1)


def dense_divergence(
    model: CPaiNN,
    params,
    x: Array,  # (N, 3) single chain
    t: Array,  # scalar
    temps: Array,  # (K,)
    atom_ids: Array,
    edges: EdgeTable,
    lane_chunk: Optional[int] = None,
):
    """(velocity (N,3), divergence scalar) with hand-propagated tangents.

    ``lane_chunk`` bounds how many of the 3N tangent lanes are in flight
    (a lax.map over chunks); None = all lanes at once.
    """
    p = params["params"]
    f = model.n_features
    n = x.shape[0]
    d = 3 * n

    # ----- primal geometry (pair grid; i = dst, j = src) -----
    r = x[None, :, :] - x[:, None, :]  # (N, N, 3): r[i, j] = x[j] - x[i]
    eye = jnp.eye(n, dtype=x.dtype)
    dist = jnp.linalg.norm(r + eye[:, :, None], axis=-1) * (1.0 - eye)
    direc = r / (1.0 + dist[..., None])
    mask = (1.0 - eye)[..., None]
    pe = positional_encoding(dist, f, model.length_scale)  # (N, N, F)
    # PE'(dist): elementwise in dist -> one jvp with unit tangent
    pe_prime = jax.jvp(
        lambda dd: positional_encoding(dd, f, model.length_scale), (dist,), (jnp.ones_like(dist),)
    )[1]

    etype = jnp.asarray(dense_edge_type_matrix(edges))
    e0 = p["edge_embed"]["embedding"][etype]  # (N, N, F)

    feats = [p["atom_embed"]["embedding"][atom_ids]]
    if model.conditioning == "ambient":
        for i_t in range(2):
            enc = temperature_encoding(
                temps[None, i_t], f, model.temp_length, model.temperatures
            )[0]
            feats.append(jnp.broadcast_to(enc, (n, f)))
    elif model.conditioning == "latent":
        enc = temperature_encoding(temps[None, 0], f, model.temp_length, model.temperatures)[0]
        feats.append(jnp.broadcast_to(enc, (n, f)))
    t_enc = positional_encoding(jnp.reshape(t, (1,)), f, model.time_length)[0]
    feats.append(jnp.broadcast_to(t_enc, (n, f)))
    s0 = _mlp(jnp.concatenate(feats, axis=-1), p["combine"])  # (N, F)

    # ----- primal forward, stashing per-layer states -----
    def fwd_all():
        s, v, e = s0, jnp.zeros((n, f, 3), x.dtype), e0
        states = []
        for layer in range(model.score_layers):
            mp = p[f"message_{layer}"]
            in_feats = jnp.concatenate(
                [jnp.broadcast_to(s[None, :, :], (n, n, f)), e], axis=-1
            )
            h = _mlp(in_feats, mp["phi"]) * _mlp(pe, mp["w"])
            h = h * mask
            gates, scale_dir, ds, de, cg = jnp.split(h, 5, axis=-1)
            q = jnp.einsum("ijf,ijc->ifc", cg, direc)
            dv = (
                jnp.einsum("ijf,jfc->ifc", gates, v)
                + jnp.einsum("ijf,ijc->ifc", scale_dir, direc)
                + jnp.cross(q, v)
            )
            up = p[f"update_{layer}"]
            s1 = s + jnp.sum(ds, axis=1)
            v1 = v + dv
            e1 = e + de
            uv = jnp.einsum("nfc,fg->ngc", v1, up["u"]["kernel"])
            vv = jnp.einsum("nfc,fg->ngc", v1, up["v"]["kernel"])
            vvn = jnp.linalg.norm(vv, axis=-1)
            hu = _mlp(jnp.concatenate([vvn, s1], axis=-1), up["mlp"])
            g_u, scale_sq, add_inv = jnp.split(hu, 3, axis=-1)
            states.append((s, v, e))
            v = v1 + g_u[..., None] * uv
            s = s1 + vvn**2 * scale_sq + add_inv
            e = e1
        return s, v, e, states

    s_fin, v_fin, _, layer_states = fwd_all()
    ro = p["readout"]
    hr = _mlp(s_fin, ro["mlp"])  # (N, 2)
    v_out = jnp.einsum("nfc,fg->ngc", v_fin, ro["V"]["kernel"])  # (N, 1, 3)
    velocity = hr[:, 1:2] * v_out[:, 0, :]

    # ----- lane-batched tangent propagation -----
    def tangent_chunk(lane_idx: Array):
        """lane_idx: (L,) flat indices into (atom, coord). Returns (L,)
        diagonal Jacobian entries d velocity[atom_l, coord_l] / d x[lane]."""
        L = lane_idx.shape[0]
        atom = lane_idx // 3
        coord = lane_idx % 3
        # d_x[l] = e_{atom_l, coord_l}: build d_r directly
        onehot_a = jax.nn.one_hot(atom, n, dtype=x.dtype)  # (L, N)
        onehot_c = jax.nn.one_hot(coord, 3, dtype=x.dtype)  # (L, 3)
        # d_r[l,i,j,c] = (δ_{j,a} - δ_{i,a}) δ_{c,c_l}
        d_r = (
            onehot_a[:, None, :, None] - onehot_a[:, :, None, None]
        ) * onehot_c[:, None, None, :]
        d_dist = jnp.sum(r * d_r, axis=-1) / (dist + eye)  # (L, N, N), diag 0
        d_dist = d_dist * (1.0 - eye)
        d_direc = (
            d_r / (1.0 + dist[..., None])
            - r[None] * (d_dist / (1.0 + dist) ** 2)[..., None]
        )
        d_pe = pe_prime[None] * d_dist[..., None]  # (L, N, N, F)

        d_s = jnp.zeros((L, n, f), x.dtype)
        d_v = jnp.zeros((L, n, f, 3), x.dtype)
        d_e = jnp.zeros((L, n, n, f), x.dtype)
        first = True

        s, v, e = s0, jnp.zeros((n, f, 3), x.dtype), e0
        for layer in range(model.score_layers):
            mp = p[f"message_{layer}"]
            s, v, e = layer_states[layer]
            in_feats = jnp.concatenate(
                [jnp.broadcast_to(s[None, :, :], (n, n, f)), e], axis=-1
            ).reshape(n * n, 2 * f)
            phi_out, w_out = _mlp(in_feats, mp["phi"]), _mlp(pe.reshape(n * n, f), mp["w"])

            d_w = _mlp_tangent_only(pe.reshape(n * n, f), d_pe.reshape(L, n * n, f), mp["w"])
            d_h = phi_out[None] * d_w
            if not first:
                d_in = jnp.concatenate(
                    [jnp.broadcast_to(d_s[:, None, :, :], (L, n, n, f)), d_e], axis=-1
                ).reshape(L, n * n, 2 * f)
                d_phi = _mlp_tangent_only(in_feats, d_in, mp["phi"])
                d_h = d_h + d_phi * w_out[None]
            h = (phi_out * w_out).reshape(n, n, 5 * f) * mask
            d_h = d_h.reshape(L, n, n, 5 * f) * mask[None]

            gates, scale_dir, ds_, de_, cg = jnp.split(h, 5, axis=-1)
            d_gates, d_scale_dir, d_ds, d_de, d_cg = jnp.split(d_h, 5, axis=-1)

            q = jnp.einsum("ijf,ijc->ifc", cg, direc)
            d_q = (
                jnp.einsum("lijf,ijc->lifc", d_cg, direc)
                + jnp.einsum("ijf,lijc->lifc", cg, d_direc)
            )
            d_dv = (
                jnp.einsum("lijf,jfc->lifc", d_gates, v)
                + jnp.einsum("ijf,ljfc->lifc", gates, d_v)
                + jnp.einsum("lijf,ijc->lifc", d_scale_dir, direc)
                + jnp.einsum("ijf,lijc->lifc", scale_dir, d_direc)
                + jnp.cross(d_q, v[None])
                + jnp.cross(q[None], d_v)
            )
            dv = (
                jnp.einsum("ijf,jfc->ifc", gates, v)
                + jnp.einsum("ijf,ijc->ifc", scale_dir, direc)
                + jnp.cross(q, v)
            )

            up = p[f"update_{layer}"]
            s1 = s + jnp.sum(ds_, axis=1)
            v1 = v + dv
            d_s1 = d_s + jnp.sum(d_ds, axis=2)
            d_v1 = d_v + d_dv
            d_e = d_e + d_de

            uv = jnp.einsum("nfc,fg->ngc", v1, up["u"]["kernel"])
            vv = jnp.einsum("nfc,fg->ngc", v1, up["v"]["kernel"])
            d_uv = jnp.einsum("lnfc,fg->lngc", d_v1, up["u"]["kernel"])
            d_vv = jnp.einsum("lnfc,fg->lngc", d_v1, up["v"]["kernel"])
            vvn = jnp.linalg.norm(vv, axis=-1)
            d_vvn = jnp.sum(vv[None] * d_vv, axis=-1) / (vvn[None] + 1e-30)

            hu_in = jnp.concatenate([vvn, s1], axis=-1)
            d_hu_in = jnp.concatenate([d_vvn, d_s1], axis=-1)
            hu = _mlp(hu_in, up["mlp"])
            d_hu = _mlp_tangent_only(hu_in, d_hu_in, up["mlp"])
            g_u, scale_sq, add_inv = jnp.split(hu, 3, axis=-1)
            d_g_u, d_scale_sq, d_add_inv = jnp.split(d_hu, 3, axis=-1)

            d_v = d_v1 + d_g_u[..., None] * uv[None] + g_u[None, ..., None] * d_uv
            d_s = (
                d_s1
                + 2.0 * vvn[None] * d_vvn * scale_sq[None]
                + (vvn**2 * 1.0)[None] * d_scale_sq
                + d_add_inv
            )
            first = False

        # readout tangent, diagonal entries only
        d_hr = _mlp_tangent_only(s_fin, d_s, ro["mlp"])  # (L, N, 2)
        d_v_out = jnp.einsum("lnfc,fg->lngc", d_v, ro["V"]["kernel"])  # (L, N, 1, 3)
        d_vel = d_hr[:, :, 1:2] * v_out[None, :, 0, :] + hr[None, :, 1:2] * d_v_out[:, :, 0, :]
        # diag: lane l -> d_vel[l, atom_l, coord_l]
        diag = jnp.sum(d_vel * onehot_a[:, :, None] * onehot_c[:, None, :], axis=(1, 2))
        return diag

    lanes = jnp.arange(d)
    if lane_chunk is None or lane_chunk >= d:
        div = jnp.sum(tangent_chunk(lanes))
    else:
        n_chunks = -(-d // lane_chunk)
        pad = n_chunks * lane_chunk - d
        # pad with repeated lane 0, subtract its extra contributions
        lanes_p = jnp.concatenate([lanes, jnp.zeros((pad,), lanes.dtype)])
        chunks = lanes_p.reshape(n_chunks, lane_chunk)
        partial = jax.lax.map(lambda c: jnp.sum(tangent_chunk(c)), chunks)
        extra = tangent_chunk(jnp.zeros((1,), lanes.dtype))[0] * pad if pad else 0.0
        div = jnp.sum(partial) - extra

    return velocity, div


def dense_divergence_fn(model, params, template, lane_chunk=None):
    """Per-chain (x, t, temps) -> (velocity, divergence) closure."""

    def f(x, t, temps):
        return dense_divergence(
            model, params, x, jnp.asarray(t), temps, template.atom_ids,
            template.edges, lane_chunk=lane_chunk,
        )

    return f
