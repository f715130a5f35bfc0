"""Whole-network Pallas divergence kernel for the dense-pair cPaiNN.

The exact-divergence node is the throughput bottleneck of transport-with-
dlogp sampling: 3N tangent lanes through 5 message layers. The XLA
linearize path is HBM-bound on per-lane tangent intermediates
((lanes, N^2, 5F) tensors per layer — measured 294 ms/node at batch 64 vs
a ~35-50 ms FLOP bound, scripts/profile_divergence.py), and kernel-per-MLP
fusion loses the win to layout copies where einsums consume pallas
outputs. This kernel therefore runs the ENTIRE lane-batched tangent
propagation of all message+update layers in VMEM per chain: a fori_loop
over lane chunks (L lanes at a time), each running all layers and writing
only the final-layer tangent states (L, N, F[,3]) — nothing per-lane ever
round-trips HBM at pair-tensor size. The primal message MLPs are
recomputed per chunk (~+25% FLOPs), which is what keeps VMEM bounded.

Math is identical to ops/dense_divergence.py (the jnp reference, itself
parity-tested against jax.linearize over models/cpainn_dense.apply_dense);
parity is asserted in tests/test_pallas_kernels.py. The readout tangent
and diagonal extraction stay in jnp (small).

Layout conventions (TPU tiling wants >=2-D, minor dim 128):
- pair tensors are (N^2, F) values with dst-major rows p = i*N + j (refs
  padded to sublane multiples, sliced after load);
- tangent state is LANE-MAJOR on the leading row axis ((L*N, F) node
  tangents, (L*N^2, F) pair tangents) so no per-lane loops exist;
- the per-lane scalar geometry is packed as (n_chunks, L*N^2, 8) with
  [d_dist, d_direc_xyz] on the minor dim, indexed by the chunk fori_loop;
- equivariant tensors are split per Cartesian component c in {0,1,2}.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ti_tpu.models.cpainn import CPaiNN
from ti_tpu.models.cpainn_dense import dense_edge_type_matrix
from ti_tpu.models.embeddings import positional_encoding, temperature_encoding
from ti_tpu.ops.pallas_kernels import _mlp_block, mlp_weights_from_flax
from ti_tpu.ops.dense_divergence import (
    _ln_silu_residuals,
    _ln_silu_tangent,
    _mlp_tangent_only,
)

Array = jax.Array


def _pad_to(a: Array, rows: int, axis: int = 0) -> Array:
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, rows - a.shape[axis])
    return jnp.pad(a, pad)


def _pack_mlp_stacks(params, score_layers: int):
    """Stack phi/w/update MLP weights into uniform padded arrays.

    Order per layer: [phi, w, update-mlp]. w1 padded to (2F, F) with zero
    rows (inputs are zero-padded to 2F accordingly, exact); w3/b3 padded to
    5F cols with zeros (outputs sliced back).
    """
    p = params["params"]
    w1s, w2s, w3s, vecs, b3s = [], [], [], [], []
    for layer in range(score_layers):
        for name in ("phi", "w", "mlp"):
            sub = (
                p[f"message_{layer}"][name]
                if name != "mlp"
                else p[f"update_{layer}"]["mlp"]
            )
            w = mlp_weights_from_flax(sub)
            f = w.w2.shape[0]
            w1s.append(_pad_to(w.w1, 2 * f))
            w2s.append(w.w2)
            w3s.append(_pad_to(w.w3, 5 * f, axis=1))
            vecs.append(
                jnp.stack([w.b1, w.ln1_scale, w.ln1_bias, w.b2, w.ln2_scale, w.ln2_bias])
            )
            b3s.append(_pad_to(w.b3[None], 5 * f, axis=1))
    uk = jnp.stack([p[f"update_{l}"]["u"]["kernel"] for l in range(score_layers)])
    vk = jnp.stack([p[f"update_{l}"]["v"]["kernel"] for l in range(score_layers)])
    return (
        jnp.stack(w1s), jnp.stack(w2s), jnp.stack(w3s),
        jnp.stack(vecs), jnp.stack(b3s), uk, vk,
    )


def _mlp_fwd_res(x, w1, vec, w2, w3, b3):
    h = jnp.dot(x, w1[: x.shape[1]], preferred_element_type=jnp.float32) + vec[0:1]
    a1, r1 = _ln_silu_residuals(h, vec[1:2], vec[2:3])
    h2 = jnp.dot(a1, w2, preferred_element_type=jnp.float32) + vec[3:4]
    a2, r2 = _ln_silu_residuals(h2, vec[4:5], vec[5:6])
    out = jnp.dot(a2, w3, preferred_element_type=jnp.float32) + b3
    return out, (r1, r2)


def _mlp_tan(dx, res, w1, vec, w2, w3, reps: int):
    """Tangent map with residuals tiled over ``reps`` lane blocks.

    dx: (reps*R, <=2F); res from _mlp_fwd_res at (R, ...) rows.
    """
    r1, r2 = res
    tile = lambda t: jnp.concatenate([t] * reps, axis=0) if reps > 1 else t
    dh = jnp.dot(dx, w1[: dx.shape[1]], preferred_element_type=jnp.float32)
    da = _ln_silu_tangent(tuple(tile(t) for t in r1), dh, vec[1:2])
    dh = jnp.dot(da, w2, preferred_element_type=jnp.float32)
    da = _ln_silu_tangent(tuple(tile(t) for t in r2), dh, vec[4:5])
    return jnp.dot(da, w3, preferred_element_type=jnp.float32)


def _make_kernel(n: int, f: int, L: int, score_layers: int, n_chunks: int, np_: int):
    """Kernel body closure over static shapes.

    All tangent state rides the LEADING row axis lane-major — d_s/d_v are
    (L*n, F), pair tangents are (L*n^2, F) — so there are no per-lane
    python loops (compile-time op count stays ~400, not ~1500·L) and every
    elementwise/matmul op is a single large VPU/MXU operation.
    """
    n2 = n * n

    def kernel(
        s_ref, v0_ref, v1_ref, v2_ref, e_ref, pe_ref, pp_ref, dir_ref,
        geom_ref,
        w1_ref, w2_ref, w3_ref, vec_ref, b3_ref, u_ref, vk_ref,
        ds_out, dv0_out, dv1_out, dv2_out,
    ):
        pe = pe_ref[0][:n2]
        pp = pp_ref[0][:n2]
        dir_c = [dir_ref[0][:n2, c : c + 1] for c in range(3)]  # (n2, 1)

        row = jax.lax.broadcasted_iota(jnp.int32, (n2, 1), 0)
        mask = jnp.where((row // n) != (row % n), 1.0, 0.0)
        mask_l = jnp.broadcast_to(mask[None], (L, n2, 1)).reshape(L * n2, 1)

        def mw(idx):
            return (
                w1_ref[idx], w2_ref[idx], w3_ref[idx], vec_ref[idx], b3_ref[idx, 0:1]
            )

        def sum_j(pair_nf):  # (n2, F) -> (n, F)
            return jnp.sum(pair_nf.reshape(n, n, f), axis=1)

        def sum_j_l(pair_lnf):  # (L*n2, F) -> (L*n, F)
            return jnp.sum(pair_lnf.reshape(L, n, n, f), axis=2).reshape(L * n, f)

        def tile_src(node_nf):  # (n, F) -> (n2, F): row p=i*n+j -> node[j]
            return jnp.broadcast_to(node_nf[None], (n, n, f)).reshape(n2, f)

        def tile_src_l(node_lnf):  # (L*n, F) -> (L*n2, F)
            a = node_lnf.reshape(L, 1, n, f)
            return jnp.broadcast_to(a, (L, n, n, f)).reshape(L * n2, f)

        def bcast_l(x):  # (R, F) -> (L*R, F)
            return jnp.broadcast_to(x[None], (L,) + x.shape).reshape(L * x.shape[0], -1)

        def chunk_body(kk, _):
            geom = geom_ref[0, kk][: L * n2]  # (L*n2, 8): [d_dist, d_direc xyz]
            dd = geom[:, 0:1]
            ddir = [geom[:, 1 + c : 2 + c] for c in range(3)]

            d_s = jnp.zeros((L * n, f), jnp.float32)
            d_v = [jnp.zeros((L * n, f), jnp.float32) for _ in range(3)]
            d_e = jnp.zeros((L * n2, f), jnp.float32)

            for layer in range(score_layers):
                s = s_ref[0, layer][:n]  # (n, F)
                v_c = [v0_ref[0, layer][:n], v1_ref[0, layer][:n], v2_ref[0, layer][:n]]
                e = e_ref[0, layer][:n2]  # (n2, F)

                # ---- primal message MLPs (recomputed per chunk) ----
                in_feats = jnp.concatenate([tile_src(s), e], axis=1)  # (n2, 2F)
                pw1, pw2, pw3, pvec, pb3 = mw(3 * layer + 0)
                ww1, ww2, ww3, wvec, wb3 = mw(3 * layer + 1)
                phi_out, phi_res = _mlp_fwd_res(in_feats, pw1, pvec, pw2, pw3, pb3)
                w_out, w_res = _mlp_fwd_res(pe, ww1, wvec, ww2, ww3, wb3)

                # ---- tangent of h = phi(in)*w(pe), lane-major rows ----
                d_pe = bcast_l(pp) * dd  # (L*n2, F)
                d_w = _mlp_tan(d_pe, w_res, ww1, wvec, ww2, ww3, L)
                d_h = bcast_l(phi_out) * d_w
                if layer > 0:
                    d_in = jnp.concatenate([tile_src_l(d_s), d_e], axis=1)
                    d_phi = _mlp_tan(d_in, phi_res, pw1, pvec, pw2, pw3, L)
                    d_h = d_h + d_phi * bcast_l(w_out)

                h = phi_out * w_out * mask
                gates, scale_dir, ds_, de_, cg = [
                    h[:, i * f : (i + 1) * f] for i in range(5)
                ]
                d_h = d_h * mask_l
                d_e = d_e + d_h[:, 3 * f : 4 * f]
                d_gates, d_scale_dir, d_ds, _, d_cg = [
                    d_h[:, i * f : (i + 1) * f] for i in range(5)
                ]

                # ---- primal aggregation ----
                q_c = [sum_j(cg * dir_c[c]) for c in range(3)]
                v_src = [tile_src(v_c[c]) for c in range(3)]
                dv_c = []
                for c in range(3):
                    c1, c2 = (c + 1) % 3, (c + 2) % 3
                    agg = sum_j(gates * v_src[c] + scale_dir * dir_c[c])
                    dv_c.append(agg + q_c[c1] * v_c[c2] - q_c[c2] * v_c[c1])
                s1 = s + sum_j(ds_)
                v1_c = [v_c[c] + dv_c[c] for c in range(3)]

                # ---- tangent aggregation (lane-major) ----
                d_q_c = [
                    sum_j_l(d_cg * bcast_l(dir_c[c]) + bcast_l(cg) * ddir[c])
                    for c in range(3)
                ]
                new_d_v = []
                for c in range(3):
                    c1, c2 = (c + 1) % 3, (c + 2) % 3
                    agg = sum_j_l(
                        d_gates * bcast_l(v_src[c])
                        + bcast_l(gates) * tile_src_l(d_v[c])
                        + d_scale_dir * bcast_l(dir_c[c])
                        + bcast_l(scale_dir) * ddir[c]
                    )
                    d_cross = (
                        d_q_c[c1] * bcast_l(v_c[c2]) + bcast_l(q_c[c1]) * d_v[c2]
                        - d_q_c[c2] * bcast_l(v_c[c1]) - bcast_l(q_c[c2]) * d_v[c1]
                    )
                    new_d_v.append(d_v[c] + agg + d_cross)
                d_s = d_s + sum_j_l(d_ds)

                # ---- update block: primal ----
                uw1, uw2, uw3, uvec, ub3 = mw(3 * layer + 2)
                uk = u_ref[layer]
                vk = vk_ref[layer]
                uv_c = [
                    jnp.dot(v1_c[c], uk, preferred_element_type=jnp.float32)
                    for c in range(3)
                ]
                vv_c = [
                    jnp.dot(v1_c[c], vk, preferred_element_type=jnp.float32)
                    for c in range(3)
                ]
                vvn = jnp.sqrt(vv_c[0] ** 2 + vv_c[1] ** 2 + vv_c[2] ** 2 + 1e-30)
                hu_in = jnp.concatenate([vvn, s1], axis=1)
                hu, hu_res = _mlp_fwd_res(hu_in, uw1, uvec, uw2, uw3, ub3)
                g_u, scale_sq, add_inv = [
                    hu[:, i * f : (i + 1) * f] for i in range(3)
                ]

                # ---- update block: tangent (lane-major) ----
                d_vv_c = [
                    jnp.dot(new_d_v[c], vk, preferred_element_type=jnp.float32)
                    for c in range(3)
                ]
                d_vvn = (
                    bcast_l(vv_c[0]) * d_vv_c[0]
                    + bcast_l(vv_c[1]) * d_vv_c[1]
                    + bcast_l(vv_c[2]) * d_vv_c[2]
                ) / bcast_l(vvn)
                d_hu = _mlp_tan(
                    jnp.concatenate([d_vvn, d_s], axis=1), hu_res, uw1, uvec, uw2, uw3, L
                )
                d_g_u, d_scale_sq, d_add_inv = [
                    d_hu[:, i * f : (i + 1) * f] for i in range(3)
                ]
                d_uv_c = [
                    jnp.dot(new_d_v[c], uk, preferred_element_type=jnp.float32)
                    for c in range(3)
                ]
                d_v = [
                    new_d_v[c] + d_g_u * bcast_l(uv_c[c]) + bcast_l(g_u) * d_uv_c[c]
                    for c in range(3)
                ]
                d_s = (
                    d_s
                    + 2.0 * bcast_l(vvn) * d_vvn * bcast_l(scale_sq)
                    + bcast_l(vvn**2) * d_scale_sq
                    + d_add_inv
                )

            def out_pad(a):  # (L*n, F) -> (L, NP, F)
                return _pad_to(a.reshape(L, n, f), np_, axis=1)

            ds_out[0, kk] = out_pad(d_s)
            dv0_out[0, kk] = out_pad(d_v[0])
            dv1_out[0, kk] = out_pad(d_v[1])
            dv2_out[0, kk] = out_pad(d_v[2])
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    return kernel


def _primal_layer_states(model, params, x, t, temps, atom_ids, etype):
    """Per-chain primal forward stashing pre-layer (s, v, e) states plus the
    lane-tangent geometry — mirrors ops/dense_divergence."""
    p = params["params"]
    f = model.n_features
    n = x.shape[0]
    r = x[None, :, :] - x[:, None, :]
    eye = jnp.eye(n, dtype=x.dtype)
    dist = jnp.linalg.norm(r + eye[:, :, None], axis=-1) * (1.0 - eye)
    direc = r / (1.0 + dist[..., None])
    mask = (1.0 - eye)[..., None]
    pe = positional_encoding(dist, f, model.length_scale)
    pe_prime = jax.jvp(
        lambda dd: positional_encoding(dd, f, model.length_scale),
        (dist,), (jnp.ones_like(dist),),
    )[1]
    e = p["edge_embed"]["embedding"][etype]
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
    s = _mlp_block(jnp.concatenate(feats, axis=-1), mlp_weights_from_flax(p["combine"]))
    v = jnp.zeros((n, f, 3), x.dtype)

    s_l, v_l, e_l = [], [], []
    for layer in range(model.score_layers):
        mp = p[f"message_{layer}"]
        s_l.append(s)
        v_l.append(v)
        e_l.append(e)
        in_feats = jnp.concatenate([jnp.broadcast_to(s[None], (n, n, f)), e], axis=-1)
        h = (
            _mlp_block(in_feats, mlp_weights_from_flax(mp["phi"]))
            * _mlp_block(pe, mlp_weights_from_flax(mp["w"]))
        ) * mask
        gates, scale_dir, ds_, de_, cg = jnp.split(h, 5, axis=-1)
        q = jnp.einsum("ijf,ijc->ifc", cg, direc)
        dv = (
            jnp.einsum("ijf,jfc->ifc", gates, v)
            + jnp.einsum("ijf,ijc->ifc", scale_dir, direc)
            + jnp.cross(q, v)
        )
        up = p[f"update_{layer}"]
        s1 = s + jnp.sum(ds_, axis=1)
        v1 = v + dv
        e = e + de_
        uv = jnp.einsum("nfc,fg->ngc", v1, up["u"]["kernel"])
        vv = jnp.einsum("nfc,fg->ngc", v1, up["v"]["kernel"])
        vvn = jnp.linalg.norm(vv, axis=-1)
        hu = _mlp_block(
            jnp.concatenate([vvn, s1], axis=-1), mlp_weights_from_flax(up["mlp"])
        )
        g_u, scale_sq, add_inv = jnp.split(hu, 3, axis=-1)
        v = v1 + g_u[..., None] * uv
        s = s1 + vvn**2 * scale_sq + add_inv

    d = 3 * n
    lanes = jnp.arange(d)
    onehot_a = jax.nn.one_hot(lanes // 3, n, dtype=x.dtype)
    onehot_c = jax.nn.one_hot(lanes % 3, 3, dtype=x.dtype)
    d_r = (
        onehot_a[:, None, :, None] - onehot_a[:, :, None, None]
    ) * onehot_c[:, None, None, :]
    d_dist = jnp.sum(r * d_r, axis=-1) / (dist + eye) * (1.0 - eye)
    d_direc = (
        d_r / (1.0 + dist[..., None])
        - r[None] * (d_dist / (1.0 + dist) ** 2)[..., None]
    )

    return dict(
        s_l=jnp.stack(s_l), v_l=jnp.stack(v_l), e_l=jnp.stack(e_l),
        s_fin=s, v_fin=v, pe=pe, pe_prime=pe_prime, direc=direc,
        d_dist=d_dist, d_direc=d_direc,
    )


@functools.partial(
    jax.jit, static_argnames=("model", "lanes_per_chunk", "interpret")
)
def _div_kernel_run(model, params, xs, t, temps, atom_ids, etype, lanes_per_chunk, interpret):
    f = model.n_features
    sl = model.score_layers
    c, n, _ = xs.shape
    d = 3 * n
    L = lanes_per_chunk
    n_chunks = -(-d // L)
    lp = n_chunks * L
    n2p = -(-(n * n) // 8) * 8
    np_ = -(-n // 8) * 8

    st = jax.vmap(
        lambda x, tp: _primal_layer_states(model, params, x, t, tp, atom_ids, etype)
    )(xs, temps)

    s_layers = _pad_to(st["s_l"], np_, axis=2)  # (C, SL, NP, F)
    v_c = [_pad_to(st["v_l"][..., cc], np_, axis=2) for cc in range(3)]
    e_layers = _pad_to(st["e_l"].reshape(c, sl, n * n, f), n2p, axis=2)
    pe = _pad_to(st["pe"].reshape(c, n * n, f), n2p, axis=1)
    pe_prime = _pad_to(st["pe_prime"].reshape(c, n * n, f), n2p, axis=1)
    direc = _pad_to(
        jnp.pad(st["direc"].reshape(c, n * n, 3), ((0, 0), (0, 0), (0, 5))), n2p, axis=1
    )  # (C, N2P, 8)

    # lane-major scalar tangent geometry: (C, n_chunks, L*n^2, 8) with
    # cols [d_dist, d_direc_xyz, 0...]; padded lanes have ZERO tangents
    geom = jnp.concatenate(
        [
            st["d_dist"].reshape(c, d, n * n)[..., None],
            st["d_direc"].reshape(c, d, n * n, 3),
        ],
        axis=-1,
    )  # (C, D, n^2, 4)
    geom = jnp.pad(geom, ((0, 0), (0, lp - d), (0, 0), (0, 4)))
    geom = geom.reshape(c, n_chunks, L * n * n, 8)

    w1s, w2s, w3s, vecs, b3s, uk, vk = _pack_mlp_stacks(params, sl)
    b3s = jnp.pad(b3s, ((0, 0), (0, 7), (0, 0)))  # (3SL, 8, 5F) sublane pad

    kernel = _make_kernel(n, f, L, sl, n_chunks, np_)
    grid = (c,)
    chain = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda ci: (ci,) + (0,) * len(shape), memory_space=pltpu.VMEM
    )
    shared = lambda shape: pl.BlockSpec(
        shape, lambda ci: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out_spec = chain((n_chunks, L, np_, f))
    out_shape = jax.ShapeDtypeStruct((c, n_chunks, L, np_, f), jnp.float32)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            chain((sl, np_, f)),
            chain((sl, np_, f)), chain((sl, np_, f)), chain((sl, np_, f)),
            chain((sl, n2p, f)),
            chain((n2p, f)), chain((n2p, f)),
            chain((n2p, 8)),
            chain((n_chunks, L * n * n, 8)),
            shared((3 * sl, 2 * f, f)), shared((3 * sl, f, f)), shared((3 * sl, f, 5 * f)),
            shared((3 * sl, 6, f)), shared((3 * sl, 8, 5 * f)),
            shared((sl, f, f)), shared((sl, f, f)),
        ],
        out_specs=[out_spec, out_spec, out_spec, out_spec],
        out_shape=[out_shape, out_shape, out_shape, out_shape],
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(
        s_layers, v_c[0], v_c[1], v_c[2], e_layers, pe, pe_prime, direc,
        geom,
        w1s, w2s, w3s, vecs, b3s, uk, vk,
    )
    d_s_all, dv0, dv1, dv2 = [o.reshape(c, lp, np_, f) for o in outs]

    # readout tangent + diagonal extraction (jnp; small)
    p = params["params"]
    ro = p["readout"]
    d_v_all = jnp.stack([dv0, dv1, dv2], axis=-1)[:, :d, :n]  # (C, D, N, F, 3)
    d_s_all = d_s_all[:, :d, :n]  # (C, D, N, F)

    def readout_diag(s_fin, v_fin, d_s, d_v):
        hr = _mlp_block(s_fin, mlp_weights_from_flax(ro["mlp"]))
        v_out = jnp.einsum("nfc,fg->ngc", v_fin, ro["V"]["kernel"])
        d_hr = _mlp_tangent_only(s_fin, d_s, ro["mlp"])
        d_v_out = jnp.einsum("lnfc,fg->lngc", d_v, ro["V"]["kernel"])
        d_vel = (
            d_hr[:, :, 1:2] * v_out[None, :, 0, :]
            + hr[None, :, 1:2] * d_v_out[:, :, 0, :]
        )
        lanes = jnp.arange(d)
        oa = jax.nn.one_hot(lanes // 3, n, dtype=s_fin.dtype)
        oc = jax.nn.one_hot(lanes % 3, 3, dtype=s_fin.dtype)
        return jnp.sum(d_vel * oa[:, :, None] * oc[:, None, :])

    divs = jax.vmap(readout_diag)(st["s_fin"], st["v_fin"], d_s_all, d_v_all)
    return divs


def divergence_kernel_batch(
    model: CPaiNN,
    params,
    xs: Array,  # (C, N, 3)
    t,
    temps: Array,  # (C, K)
    template,
    lanes_per_chunk: int = 4,
    interpret: bool = False,
) -> Array:
    """Exact divergence for a batch of chains via the whole-net kernel."""
    etype = jnp.asarray(dense_edge_type_matrix(template.edges))
    return _div_kernel_run(
        model, params, xs, jnp.asarray(t), temps,
        jnp.asarray(template.atom_ids), etype, lanes_per_chunk, interpret,
    )
