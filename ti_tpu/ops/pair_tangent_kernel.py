"""Pair-layer message kernel with K Hutchinson tangent lanes in VMEM —
the divergence-node attack (VERDICT r4 task 2 step 2).

The quadrature-dlogp headline's dominant cost is the divergence node: the
XLA path (jax.linearize of the dense forward + vmap over K probe lanes)
re-reads every message-layer residual from HBM once PER LANE — at the
bench config that is ~5 layers x ~6 (N^2, F) tensors x K=16 lanes of HBM
traffic per chain-node, the measured bandwidth wall (BASELINE.md "the
divergence node is HBM-bound on per-lane tangent intermediates"; the
reference's equivalent cost center is the 3N-backward-pass loop,
mdqm9/thermo/ambient/models/ode_wrapper.py:60-91).

This kernel extends the fused pair-layer kernel (ops/pair_layer_kernel.py,
the 1.65-2x SDE win) to forward-mode: one Pallas grid runs (chain b,
lane-block kb) with kb fastest, where

- kb = 0 computes the PRIMAL message layer exactly like the pair-layer
  kernel and leaves the tangent-replay residuals (pre-LN dots of both
  message MLPs, both 5F outputs, the masked product, pair geometry, the
  d(positional-encoding)/d(dist) factor, and the chirality aggregate) in
  VMEM scratch;
- kb = 1..K/L replay a BLOCK of L tangent lanes from the stored
  residuals: per-lane geometry tangents (dr -> ddist -> ddir/dpe) feed
  lane-stacked (L*Pp, .) MLP tangent chains — the dots run JOINTLY over
  the block (L x the rows per MXU dot, 1/L the per-step pipeline
  overhead; the round-5 probe-scaling measurement showed per-lane cost
  is what bounds the node), then the product rule / aggregations /
  chirality run per lane on the stored primals.

Because the chain-indexed inputs (x, s, v, e, weights) use index maps
that ignore kb, Pallas keeps their blocks resident across the lane steps
of a chain (block revisiting): HBM traffic per chain-layer is the primal
once plus K *lane-sized* tangent streams — the residual re-reads that
bound the XLA path never happen.

The cheap O(N)-row segments (node-update layers, readout) stay in XLA as
a lane-broadcast hand-JVP (`_mlp_block_jvp` broadcasts a (B, K, ...)
tangent batch against a (B, 1, ...) primal, so the primal chain is
computed once, not per lane).

Precision profiles mirror the qualified pair-layer kernel: f32, or
``compute_dtype="bf16_agg"`` (bf16 pair-grid storage + dot operands, f32
dot accumulation, f32 LN statistics — the physics-qualified envelope of
the dense XLA bf16_agg path).

Parity: tests/test_pair_tangent_kernel.py asserts (velocity, K-lane JVP)
against jax.jvp of the dense XLA forward, and that the orthogonal probe
frame at K = 3N reproduces ops.divergence.divergence_exact.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ti_tpu.ops.pallas_kernels import (
    MLPWeights,
    _ln_silu_block,
    _ln_silu_block_agg,
    _mlp_block_jvp,
    mlp_weights_from_flax,
)

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pair_tangent_kernel(
    n: int,
    f: int,
    lane_block: int,
    length_scale: float,
    bf16: bool,
    # inputs (chain-resident across lane steps)
    x_ref,       # (1, Np, 128)   positions, lanes 0..2 (f32)
    s_ref,       # (1, Np, F)     invariant node features (wd)
    v_ref,       # (1, 3*Np, F)   equivariant features, component-major (wd)
    e_ref,       # (1, Pp, F)     pair features, row-major p = i*N + j (wd)
    # tangent inputs (streamed per lane-block step; kb=0 fetch is unused)
    dx_ref,      # (1, L, Np, 128)
    ds_ref,      # (1, L, Np, F)
    dv_ref,      # (1, L, 3*Np, F)
    de_ref,      # (1, L, Pp, F)
    *refs,       # 20 weight refs, 6 outputs, then scratch
):
    L = lane_block
    phi = MLPWeights(*(r[:] for r in refs[:10]))
    w = MLPWeights(*(r[:] for r in refs[10:20]))
    (dvp_ref, dsp_ref, ep_ref,          # primal outputs (written at kb=0)
     dvt_ref, dst_ref, et_ref) = refs[20:26]   # tangent outputs (kb>0)
    (r_ref, aux_ref, pefac_ref, h1p_ref, h2p_ref, outp_ref,
     h1w_ref, h2w_ref, outw_ref, hmask_ref, tcg_ref) = refs[26:]

    k = pl.program_id(1)
    wd = jnp.bfloat16 if bf16 else jnp.float32

    def dot(a, b):
        if bf16:
            return jax.lax.dot(
                a.astype(wd), b.astype(wd), preferred_element_type=jnp.float32
            ).astype(wd)
        return jax.lax.dot(a, b, preferred_element_type=jnp.float32)

    def dot_f32(a, b):
        # f32-accumulated dot whose OUTPUT stays f32 (aggregations)
        if bf16:
            return jax.lax.dot(
                a.astype(wd), b.astype(wd), preferred_element_type=jnp.float32
            )
        return jax.lax.dot(a, b, preferred_element_type=jnp.float32)

    def ln_silu(h, scale, bias):
        if bf16:
            return _ln_silu_block_agg(h, scale, bias)
        return _ln_silu_block(h, scale, bias)

    def bias(a):
        return a.astype(wd) if bf16 else a

    np_, pp = x_ref.shape[1], e_ref.shape[1]
    pad_p = pp - n * n

    def tile_rows(a):  # (N, W) -> (P, W), j cycles fast (src pattern)
        wdt = a.shape[-1]
        return jnp.reshape(jnp.broadcast_to(a[None, :, :], (n, n, wdt)), (n * n, wdt))

    def repeat_rows(a):  # (N, W) -> (P, W), i repeats (dst pattern)
        wdt = a.shape[-1]
        return jnp.reshape(jnp.broadcast_to(a[:, None, :], (n, n, wdt)), (n * n, wdt))

    def pad_rows(a):
        if pad_p == 0:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((pad_p, a.shape[-1]), a.dtype)], axis=0
        )

    # dst-block selection matrix for aggregations (rebuilt per step — iota
    # compare is free next to the dots)
    row = jax.lax.broadcasted_iota(jnp.int32, (np_, pp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, pp), 1)
    S = (row == col // n).astype(wd)

    def agg(rows):  # (Pp, F) -> (Np, F), f32 accumulation
        return dot_f32(S, rows)

    lane = jax.lax.broadcasted_iota(jnp.int32, (pp, f), 1)
    rank = (lane // 2 + 1).astype(jnp.float32)

    # ---------------- primal (kb == 0): compute + stash residuals --------
    @pl.when(k == 0)
    def _primal():
        s = s_ref[0][:n]
        e = e_ref[0]
        xs = x_ref[0][:n]

        r = pad_rows(tile_rows(xs) - repeat_rows(xs))          # (Pp, 128) f32
        d2 = r[:, 0:1] ** 2 + r[:, 1:2] ** 2 + r[:, 2:3] ** 2
        dist = jnp.sqrt(d2)
        inv = 1.0 / (1.0 + dist)
        safe_inv_d = jnp.where(dist > 0, 1.0 / jnp.maximum(dist, 1e-30), 0.0)

        p_iota = jax.lax.broadcasted_iota(jnp.int32, (pp, 1), 0)
        i_idx = p_iota // n
        j_idx = p_iota - i_idx * n
        active = jnp.logical_and(i_idx != j_idx, p_iota < n * n)
        maskf = active.astype(jnp.float32)                     # (Pp, 1)

        r_ref[...] = r
        aux_ref[...] = jnp.concatenate(
            [dist, inv, safe_inv_d, maskf,
             jnp.zeros((pp, aux_ref.shape[-1] - 4), jnp.float32)], axis=1
        )

        ang = dist * rank * (math.pi / length_scale)           # (Pp, F)
        even = lane % 2 == 0
        pe = jnp.where(even, jnp.cos(ang), jnp.sin(ang)).astype(wd)
        pefac_ref[...] = (
            jnp.where(even, -jnp.sin(ang), jnp.cos(ang))
            * rank * (math.pi / length_scale)
        ).astype(wd)

        s_src = pad_rows(tile_rows(s))
        in_feats = jnp.concatenate([s_src, e], axis=-1)        # (Pp, 2F)

        def mlp_store(xrow, wts, h1_ref, h2_ref):
            h1 = dot(xrow, wts.w1) + bias(wts.b1)
            h1_ref[...] = h1
            a1 = ln_silu(h1, wts.ln1_scale, wts.ln1_bias)
            h2 = dot(a1, wts.w2) + bias(wts.b2)
            h2_ref[...] = h2
            a2 = ln_silu(h2, wts.ln2_scale, wts.ln2_bias)
            return dot(a2, wts.w3) + bias(wts.b3)

        p_out = mlp_store(in_feats, phi, h1p_ref, h2p_ref)     # (Pp, 5F)
        q_out = mlp_store(pe, w, h1w_ref, h2w_ref)
        outp_ref[...] = p_out
        outw_ref[...] = q_out
        maskw = maskf.astype(wd)
        h = p_out * q_out * maskw
        hmask_ref[...] = h

        gates = h[:, 0 * f: 1 * f]
        scale_dir = h[:, 1 * f: 2 * f]
        ds_h = h[:, 2 * f: 3 * f]
        de_h = h[:, 3 * f: 4 * f]
        cg = h[:, 4 * f: 5 * f]

        v = v_ref[0]
        out_cols = []
        t_cg = []
        for c in range(3):
            vc = v[c * np_: (c + 1) * np_][:n]
            vc_src = pad_rows(tile_rows(vc))
            dir_c = (r[:, c: c + 1] * inv).astype(wd)
            out_cols.append(agg(gates * vc_src + scale_dir * dir_c))
            t_cg.append(agg(cg * dir_c))                       # (Np, F) f32
        tcg_ref[...] = jnp.concatenate(t_cg, axis=-1)

        vx, vy, vz = (
            v[c * np_: (c + 1) * np_].astype(jnp.float32) for c in range(3)
        )
        cx = t_cg[1] * vz - t_cg[2] * vy
        cy = t_cg[2] * vx - t_cg[0] * vz
        cz = t_cg[0] * vy - t_cg[1] * vx

        dvp_ref[0] = jnp.concatenate(
            [out_cols[0] + cx, out_cols[1] + cy, out_cols[2] + cz], axis=-1
        )
        dsp_ref[0] = agg(ds_h)
        ep_ref[0] = e + de_h

    # ------------- tangent lane blocks (kb > 0): replay from scratch -----
    @pl.when(k > 0)
    def _tangent():
        r = r_ref[:]
        aux = aux_ref[:]
        inv = aux[:, 1:2]
        sid = aux[:, 2:3]
        maskf = aux[:, 3:4]
        maskw = maskf.astype(wd)
        pefac = pefac_ref[:]
        outp = outp_ref[:]
        outw = outw_ref[:]
        h = hmask_ref[:]
        gates = h[:, 0 * f: 1 * f]
        scale_dir = h[:, 1 * f: 2 * f]
        cg = h[:, 4 * f: 5 * f]
        tcg = tcg_ref[:]
        t0, t1, t2 = (tcg[:, c * f: (c + 1) * f] for c in range(3))
        v = v_ref[0]
        vx, vy, vz = (
            v[c * np_: (c + 1) * np_].astype(jnp.float32) for c in range(3)
        )

        def ln_silu_tan(hp, dh, scale, bias_):
            # tangent of LN(+affine)->SiLU at the stored pre-LN primal hp
            # (tiled x L); statistics recomputed f32 per row — the same
            # recompute-over-residuals trade _ln_silu_jvp makes
            h32 = hp.astype(jnp.float32)
            dh32 = dh.astype(jnp.float32)
            mu = jnp.mean(h32, axis=-1, keepdims=True)
            cen = h32 - mu
            var = jnp.mean(cen ** 2, axis=-1, keepdims=True)
            rstd = jax.lax.rsqrt(var + 1e-5)
            xhat = cen * rstd
            dmu = jnp.mean(dh32, axis=-1, keepdims=True)
            dcen = dh32 - dmu
            dvar = 2.0 * jnp.mean(cen * dh32, axis=-1, keepdims=True)
            drstd = -0.5 * rstd * rstd * rstd * dvar
            dl = (dcen * rstd + cen * drstd) * scale
            l = xhat * scale + bias_
            sig = jax.nn.sigmoid(l)
            da = sig * (1.0 + l * (1.0 - sig)) * dl
            return da.astype(hp.dtype)

        def tile_l(a):  # (Pp, W) -> (L*Pp, W): broadcast a primal over lanes
            if L == 1:
                return a
            return jnp.concatenate([a] * L, axis=0)

        def mlp_tan(dxrow, wts, h1, h2):
            # lane-stacked tangent replay: dots run jointly over L*Pp rows
            dh1 = dot(dxrow, wts.w1)
            da1 = ln_silu_tan(tile_l(h1), dh1, wts.ln1_scale, wts.ln1_bias)
            dh2 = dot(da1, wts.w2)
            da2 = ln_silu_tan(tile_l(h2), dh2, wts.ln2_scale, wts.ln2_bias)
            return dot(da2, wts.w3)

        # per-lane geometry tangents -> lane-stacked MLP inputs. The L
        # lanes arrive stacked along the ROW axis of each block
        # ((1, 1, L*rows, W) — see the builder's `blocked` reshape).
        dx_all = dx_ref[0, 0]                                  # (L*Np, 128)
        ds_all_in = ds_ref[0, 0]                               # (L*Np, F)
        dv_all_in = dv_ref[0, 0]                               # (L*3Np, F)
        de_all_in = de_ref[0, 0]                               # (L*Pp, F)
        din_parts, dpe_parts, geo = [], [], []
        for l in range(L):
            dxs = dx_all[l * np_: l * np_ + n]                 # (N, 128) f32
            dsl = ds_all_in[l * np_: l * np_ + n]              # (N, F) wd
            del_ = de_all_in[l * pp: (l + 1) * pp]             # (Pp, F) wd
            dr = pad_rows(tile_rows(dxs) - repeat_rows(dxs))   # (Pp, 128) f32
            ddist = (
                r[:, 0:1] * dr[:, 0:1]
                + r[:, 1:2] * dr[:, 1:2]
                + r[:, 2:3] * dr[:, 2:3]
            ) * sid                                            # (Pp, 1) f32
            dinv = -(inv * inv) * ddist
            din_parts.append(jnp.concatenate(
                [pad_rows(tile_rows(dsl)), del_], axis=-1))    # (Pp, 2F)
            dpe_parts.append(pefac * ddist.astype(wd))         # (Pp, F)
            geo.append((dr, dinv, del_))

        din = din_parts[0] if L == 1 else jnp.concatenate(din_parts, axis=0)
        dpe = dpe_parts[0] if L == 1 else jnp.concatenate(dpe_parts, axis=0)
        dp = mlp_tan(din, phi, h1p_ref[:], h2p_ref[:])         # (L*Pp, 5F)
        dq = mlp_tan(dpe, w, h1w_ref[:], h2w_ref[:])

        # product rule + aggregations + chirality per lane (primal factors
        # are NOT tiled — each lane multiplies against the stored primals)
        for l in range(L):
            dr, dinv, del_ = geo[l]
            dvl = dv_all_in[l * 3 * np_: (l + 1) * 3 * np_]    # (3Np, F) wd
            dh = (dp[l * pp:(l + 1) * pp] * outw
                  + outp * dq[l * pp:(l + 1) * pp]) * maskw
            dgates = dh[:, 0 * f: 1 * f]
            dscale_dir = dh[:, 1 * f: 2 * f]
            dds = dh[:, 2 * f: 3 * f]
            dde = dh[:, 3 * f: 4 * f]
            dcg = dh[:, 4 * f: 5 * f]

            dout_cols = []
            dt_cg = []
            for c in range(3):
                vc_src = pad_rows(tile_rows(v[c * np_: (c + 1) * np_][:n]))
                dvc_src = pad_rows(tile_rows(dvl[c * np_: (c + 1) * np_][:n]))
                dir_c = (r[:, c: c + 1] * inv).astype(wd)
                ddir_c = (dr[:, c: c + 1] * inv
                          + r[:, c: c + 1] * dinv).astype(wd)
                dout_cols.append(
                    agg(dgates * vc_src + gates * dvc_src
                        + dscale_dir * dir_c + scale_dir * ddir_c)
                )
                dt_cg.append(agg(dcg * dir_c + cg * ddir_c))   # (Np, F) f32

            dvx, dvy, dvz = (
                dvl[c * np_: (c + 1) * np_].astype(jnp.float32)
                for c in range(3)
            )
            dcx = dt_cg[1] * vz + t1 * dvz - dt_cg[2] * vy - t2 * dvy
            dcy = dt_cg[2] * vx + t2 * dvx - dt_cg[0] * vz - t0 * dvz
            dcz = dt_cg[0] * vy + t0 * dvy - dt_cg[1] * vx - t1 * dvx

            dvt_ref[0, 0, l * np_: (l + 1) * np_] = jnp.concatenate(
                [dout_cols[0] + dcx, dout_cols[1] + dcy, dout_cols[2] + dcz],
                axis=-1,
            )
            dst_ref[0, 0, l * np_: (l + 1) * np_] = agg(dds)
            et_ref[0, 0, l * pp: (l + 1) * pp] = del_ + dde


@functools.lru_cache(maxsize=None)
def _build_pair_tangent_layer(
    n: int, f: int, np_: int, pp: int, k_lanes: int, lane_block: int,
    length_scale: float, interpret: bool, bf16: bool,
):
    if k_lanes % lane_block != 0:
        raise ValueError(
            f"lane_block {lane_block} must divide num_probes {k_lanes}"
        )
    L = lane_block
    kern = functools.partial(
        _pair_tangent_kernel, n, f, L, length_scale, bf16
    )
    wd = jnp.bfloat16 if bf16 else jnp.float32

    def chain_spec(rows, width):
        return pl.BlockSpec((1, rows, width), lambda b, k: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def lane_spec(rows, width):
        # tangent arrays are (B, K/L, L*rows, width) lane-blocked; block
        # kb-1 for tangent steps, a dummy (unused) fetch of block 0 at kb=0
        return pl.BlockSpec(
            (1, 1, L * rows, width),
            lambda b, k: (b, jnp.maximum(k - 1, 0), 0, 0),
            memory_space=pltpu.VMEM,
        )

    def weight_spec(shape):
        return pl.BlockSpec(shape, lambda b, k: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def call(x_pad, s_pad, v_pad, e_pad, dx, ds, dv, de,
             phi: MLPWeights, w: MLPWeights):
        b = x_pad.shape[0]

        def as2d(a):
            return a[None, :] if a.ndim == 1 else a

        def blocked(a):  # (B, K, rows, W) -> (B, K/L, L*rows, W)
            return a.reshape(b, k_lanes // L, L * a.shape[2], a.shape[3])

        phi2 = MLPWeights(*(as2d(a) for a in phi))
        w2 = MLPWeights(*(as2d(a) for a in w))
        outs = pl.pallas_call(
            kern,
            grid=(b, 1 + k_lanes // L),
            in_specs=[
                chain_spec(np_, 128),       # x
                chain_spec(np_, f),         # s
                chain_spec(3 * np_, f),     # v
                chain_spec(pp, f),          # e
                lane_spec(np_, 128),        # dx
                lane_spec(np_, f),          # ds
                lane_spec(3 * np_, f),      # dv
                lane_spec(pp, f),           # de
            ] + [weight_spec(t.shape) for t in (*phi2, *w2)],
            out_specs=[
                chain_spec(np_, 3 * f),     # dv primal
                chain_spec(np_, f),         # ds primal
                chain_spec(pp, f),          # e primal
                lane_spec(np_, 3 * f),      # dv tangent lanes
                lane_spec(np_, f),          # ds tangent lanes
                lane_spec(pp, f),           # e tangent lanes
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, np_, 3 * f), jnp.float32),
                jax.ShapeDtypeStruct((b, np_, f), jnp.float32),
                jax.ShapeDtypeStruct((b, pp, f), e_pad.dtype),
                jax.ShapeDtypeStruct(
                    (b, k_lanes // L, L * np_, 3 * f), jnp.float32),
                jax.ShapeDtypeStruct(
                    (b, k_lanes // L, L * np_, f), jnp.float32),
                jax.ShapeDtypeStruct(
                    (b, k_lanes // L, L * pp, f), e_pad.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((pp, 128), jnp.float32),   # r
                pltpu.VMEM((pp, 128), jnp.float32),   # aux (dist/inv/sid/mask)
                pltpu.VMEM((pp, f), wd),              # pefac
                pltpu.VMEM((pp, f), wd),              # h1 phi
                pltpu.VMEM((pp, f), wd),              # h2 phi
                pltpu.VMEM((pp, 5 * f), wd),          # phi out
                pltpu.VMEM((pp, f), wd),              # h1 w
                pltpu.VMEM((pp, f), wd),              # h2 w
                pltpu.VMEM((pp, 5 * f), wd),          # w out
                pltpu.VMEM((pp, 5 * f), wd),          # masked product
                pltpu.VMEM((np_, 3 * f), jnp.float32),  # t_cg aggregate
            ],
            interpret=interpret,
        )(x_pad, s_pad, v_pad, e_pad,
          blocked(dx), blocked(ds), blocked(dv), blocked(de), *phi2, *w2)
        dvp, dsp, ep, dvt, dst, et = outs

        def unblocked(a, rows):  # (B, K/L, L*rows, W) -> (B, K, rows, W)
            return a.reshape(b, k_lanes, rows, a.shape[3])

        return (dvp, dsp, ep,
                unblocked(dvt, np_), unblocked(dst, np_), unblocked(et, pp))

    return call


def _mlp_jvp_lanes(x, dx, w: MLPWeights):
    """(out (B,1,...), dout (B,K,...)) of the reference MLP, lane-batched:
    the primal chain is computed once on a broadcast axis of size 1 while
    the K tangent lanes ride the broadcast (`_mlp_block_jvp` is written on
    the trailing axis, so it broadcasts cleanly)."""
    return _mlp_block_jvp(x[:, None], dx, w)


def _pick_lane_block(k_lanes: int, bf16: bool) -> int:
    """Default lanes-per-step: the bf16 profile fits L=4 comfortably at
    bench capacity (measured 1.33x over L=1); the f32 profile's lane
    transients are 2x and L=4 FAILED the remote compile at F=128 (VMEM) —
    f32 stays at the known-compiling L=1 unless the caller overrides."""
    if not bf16:
        return 1
    for cand in (4, 2):
        if k_lanes % cand == 0:
            return cand
    return 1


def apply_dense_pair_tangent(
    model,
    params,
    x: Array,       # (B, N, 3)
    t: Array,       # (B,)
    temps: Array,   # (B, K_cond)
    z: Array,       # (B, K, N, 3) tangent probes
    atom_ids: Array,
    edges,
    *,
    interpret: bool = False,
    compute_dtype=None,
    lane_block: int | None = None,
) -> tuple[Array, Array]:
    """(velocity (B,N,3), K-lane JVP (B,K,N,3)) via the tangent kernel.

    Forward-mode with K simultaneous tangent lanes: the message layers run
    in the Pallas pair-tangent kernel (primal + lane-block replays in
    VMEM), the O(N)-row node-update and readout segments run as a
    lane-broadcast hand-JVP in XLA. The divergence estimate is then
    sum_k w_k z_k . dvel_k (see ``pair_tangent_div_fn``).

    ``compute_dtype`` in {None (f32), "bf16_agg"} — same profiles/semantics
    as ``apply_dense_pair_kernel``. ``lane_block`` = tangent lanes replayed
    per Pallas grid step (must divide K; None picks the largest of 4/2/1
    that divides) — larger blocks amortize per-step overhead and widen the
    tangent dots at ~L x the lane-transient VMEM.
    """
    import numpy as np

    from ti_tpu.models.cpainn_dense import dense_edge_type_matrix
    from ti_tpu.models.embeddings import positional_encoding, temperature_encoding

    if getattr(model, "cutoff", None) is not None:
        raise NotImplementedError(
            "apply_dense_pair_tangent supports the complete graph only "
            "(cutoff=None); use the XLA divergence path for finite-cutoff "
            "models"
        )
    if compute_dtype not in (None, "bf16_agg"):
        raise ValueError(
            "apply_dense_pair_tangent compute_dtype must be None (f32) or "
            f"'bf16_agg', got {compute_dtype!r}"
        )
    bf16 = compute_dtype == "bf16_agg"
    cd = jnp.bfloat16 if bf16 else None
    wd = jnp.bfloat16 if bf16 else jnp.float32

    def c(a):
        return a.astype(cd) if bf16 else a

    def kernel_weights(subtree):
        w = mlp_weights_from_flax(subtree)
        return w._replace(w1=c(w.w1), w2=c(w.w2), w3=c(w.w3))

    p = params["params"]
    f = model.n_features
    b, n, _ = x.shape
    k_lanes = z.shape[1]
    L = lane_block if lane_block is not None else _pick_lane_block(k_lanes, bf16)
    align = 16 if bf16 else 8
    np_ = _round_up(n, align)
    pp = _round_up(n * n, align)

    # node embeddings + combine MLP (x-independent -> tangent is zero)
    from ti_tpu.ops.pallas_kernels import _mlp_block

    mlp_kw = dict(compute_dtype=cd, bf16_out=True) if bf16 else {}
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
    s = _mlp_block(
        jnp.concatenate(feats, axis=-1), mlp_weights_from_flax(p["combine"]),
        **mlp_kw,
    )  # (B, N, F)

    etype = dense_edge_type_matrix(edges)
    etype_flat = jnp.asarray(np.asarray(etype).reshape(n * n))
    e = jnp.broadcast_to(c(p["edge_embed"]["embedding"][etype_flat]), (b, n * n, f))
    e = jnp.pad(e, ((0, 0), (0, pp - n * n), (0, 0)))

    x_pad = jnp.pad(x, ((0, 0), (0, np_ - n), (0, 128 - 3)))
    v = jnp.zeros((b, 3 * np_, f), dtype=wd)
    s = jnp.pad(c(s).astype(wd), ((0, 0), (0, np_ - n), (0, 0)))

    # tangent carries, (B, K, rows, width)
    dx = jnp.zeros((b, k_lanes, np_, 128), jnp.float32)
    dx = dx.at[:, :, :n, :3].set(z.astype(jnp.float32))
    ds_t = jnp.zeros((b, k_lanes, np_, f), wd)
    dv_t = jnp.zeros((b, k_lanes, 3 * np_, f), wd)
    de_t = jnp.zeros((b, k_lanes, pp, f), wd)

    layer_call = _build_pair_tangent_layer(
        n, f, np_, pp, k_lanes, L, float(model.length_scale), interpret, bf16
    )

    def to_cm(dv_lanes):  # (..., Np, 3F) lanes [x|y|z] -> component-major rows
        return jnp.concatenate(
            [dv_lanes[..., cc * f: (cc + 1) * f] for cc in range(3)], axis=-2
        )

    for layer in range(model.score_layers):
        mp = p[f"message_{layer}"]
        dv_p, ds_p, e, dv_all, ds_all, de_t = layer_call(
            x_pad, s, v, e, dx, ds_t, dv_t, de_t,
            kernel_weights(mp["phi"]), kernel_weights(mp["w"]),
        )
        # primal carries
        s = (s + ds_p.astype(wd)).astype(wd)
        v = (v + to_cm(dv_p).astype(wd)).astype(wd)
        # tangent carries
        ds_t = ds_t + ds_all.astype(wd)
        dv_t = dv_t + to_cm(dv_all).astype(wd)

        # ---- node update (XLA, O(N) rows): lane-broadcast hand-JVP ------
        up = p[f"update_{layer}"]
        v3 = jnp.stack(
            [v[:, cc * np_: (cc + 1) * np_, :] for cc in range(3)], axis=-1
        ).astype(jnp.float32)                        # (B, Np, F, 3)
        dv3 = jnp.stack(
            [dv_t[:, :, cc * np_: (cc + 1) * np_, :] for cc in range(3)],
            axis=-1,
        ).astype(jnp.float32)                        # (B, K, Np, F, 3)
        u_k = up["u"]["kernel"]
        v_k = up["v"]["kernel"]
        uv = jnp.einsum("bnfc,fg->bngc", v3, u_k)
        vv = jnp.einsum("bnfc,fg->bngc", v3, v_k)
        duv = jnp.einsum("bknfc,fg->bkngc", dv3, u_k)
        dvv = jnp.einsum("bknfc,fg->bkngc", dv3, v_k)
        vv_norm = jnp.linalg.norm(vv, axis=-1)       # (B, Np, G)
        safe = jnp.where(vv_norm > 0, 1.0 / jnp.maximum(vv_norm, 1e-30), 0.0)
        dnorm = jnp.sum(vv[:, None] * dvv, axis=-1) * safe[:, None]

        s32 = s.astype(jnp.float32)
        ds32 = ds_t.astype(jnp.float32)
        hu, dhu = _mlp_jvp_lanes(
            jnp.concatenate([vv_norm, s32], axis=-1),
            jnp.concatenate([dnorm, ds32], axis=-1),
            mlp_weights_from_flax(up["mlp"]),
        )
        hu = hu[:, 0]
        g_u, scale_sq, add_inv = jnp.split(hu, 3, axis=-1)
        dg_u, dscale_sq, dadd_inv = jnp.split(dhu, 3, axis=-1)
        v3 = v3 + g_u[..., None] * uv
        dv3 = dv3 + dg_u[..., None] * uv[:, None] + g_u[:, None, :, :, None] * duv
        s_new = s32 + vv_norm ** 2 * scale_sq + add_inv
        ds_new = (
            ds32
            + 2.0 * vv_norm[:, None] * dnorm * scale_sq[:, None]
            + (vv_norm ** 2)[:, None] * dscale_sq
            + dadd_inv
        )
        s = s_new.astype(wd)
        ds_t = ds_new.astype(wd)
        v = jnp.concatenate([v3[..., cc] for cc in range(3)], axis=1).astype(wd)
        dv_t = jnp.concatenate(
            [dv3[..., cc] for cc in range(3)], axis=2
        ).astype(wd)

    # ---- readout (XLA): lane-broadcast hand-JVP -------------------------
    ro = p["readout"]
    v3 = jnp.stack(
        [v[:, cc * np_: (cc + 1) * np_, :] for cc in range(3)], axis=-1
    ).astype(jnp.float32)
    dv3 = jnp.stack(
        [dv_t[:, :, cc * np_: (cc + 1) * np_, :] for cc in range(3)], axis=-1
    ).astype(jnp.float32)
    hr, dhr = _mlp_jvp_lanes(
        s.astype(jnp.float32), ds_t.astype(jnp.float32),
        mlp_weights_from_flax(ro["mlp"]),
    )
    hr = hr[:, 0]                                    # (B, Np, 2)
    v_kern = ro["V"]["kernel"]
    v_out = jnp.einsum("bnfc,fg->bngc", v3, v_kern)[:, :, 0, :]     # (B, Np, 3)
    dv_out = jnp.einsum("bknfc,fg->bkngc", dv3, v_kern)[:, :, :, 0, :]
    vel = hr[..., 1:2] * v_out
    dvel = dhr[..., 1:2] * v_out[:, None] + hr[:, None, :, 1:2] * dv_out
    return (
        vel[:, :n].astype(x.dtype),
        dvel[:, :, :n].astype(x.dtype),
    )


def pair_tangent_div_fn(
    model,
    params,
    template,
    *,
    num_probes: int = 16,
    probe_mode: str = "orthogonal",
    compute_dtype=None,
    interpret: bool = False,
    lane_block: int | None = None,
    return_var: bool = False,
):
    """Batched divergence-node estimator for ``make_ode_sampler(div_drift=)``.

    Returns ``div_fn(xs (B,N,3), t scalar, temps (B,·), key) -> (B,)``:
    draws the Hutchinson probe block per chain (same ``_probe_block``
    distributions as ops.divergence — rademacher 1/K weights or the Haar
    orthogonal frame at d/K, exact at K = 3N) and contracts the K-lane JVP
    from the pair-tangent kernel. Estimator draws differ from
    ``divergence_hutchinson`` (different key schedule), so qualification
    goes through the physics oracle, not bitwise parity. ``lane_block``
    as in ``apply_dense_pair_tangent``. ``return_var`` makes div_fn return
    the (div (B,), plug-in estimator variance (B,)) pair — the
    ``make_ode_sampler(return_dlogp_var=True)`` contract
    (ops.divergence.hutchinson_var_estimate).
    """
    from ti_tpu.ops.divergence import _probe_block, hutchinson_var_estimate

    n = int(template.atom_ids.shape[0])
    d = 3 * n

    def div_fn(xs, t, temps, key):
        b = xs.shape[0]
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(b))
        z, wts = jax.vmap(
            lambda kk: _probe_block(kk, num_probes, d, jnp.float32, probe_mode)
        )(keys)                                       # (B, K, d), (B, K)
        zt = z.reshape(b, num_probes, n, 3)
        tb = jnp.broadcast_to(jnp.asarray(t), (b,))
        _, dvel = apply_dense_pair_tangent(
            model, params, xs, tb, temps, zt, template.atom_ids,
            template.edges, interpret=interpret, compute_dtype=compute_dtype,
            lane_block=lane_block,
        )
        est = jnp.sum(zt * dvel, axis=(2, 3))         # (B, K)
        div = jnp.sum(wts * est, axis=1)
        if return_var:
            var = jax.vmap(
                lambda e, ww: hutchinson_var_estimate(e, ww, d, probe_mode)
            )(est, wts)
            return div, var
        return div

    return div_fn
