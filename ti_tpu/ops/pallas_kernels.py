"""Pallas TPU kernels for the cPaiNN hot path.

The SE3Message edge pipeline computes ``phi(in_features) * w(pe)`` where phi
and w are 3-layer MLPs ending in 5F-wide outputs (reference
mdqm9/thermo/ambient/models/cpainn.py:262-276). In XLA the two (rows, 5F)
MLP outputs and their product are materialized in HBM — for rows = B·E this
dominates HBM traffic on the bandwidth-bound sampling path. This kernel
tiles the rows and keeps every intermediate (two hidden activations, the
two 5F pre-products) in VMEM, writing only the final gated product.

Weights stay resident in VMEM across the whole grid (~1 MB at F=128).
Inference-path only (sampling/SDE): no custom VJP/JVP is defined, so the
training and divergence paths keep using the XLA composition — the
``fused`` flag in callers must only be set where no autodiff crosses the
kernel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


class MLPWeights(NamedTuple):
    """Weights of one reference-style MLP: Dense-LN-SiLU ×2 -> Dense."""

    w1: Array  # (f_in, f_hidden)
    b1: Array
    ln1_scale: Array
    ln1_bias: Array
    w2: Array  # (f_hidden, f_hidden)
    b2: Array
    ln2_scale: Array
    ln2_bias: Array
    w3: Array  # (f_hidden, f_out)
    b3: Array


def mlp_weights_from_flax(p) -> MLPWeights:
    """Extract MLPWeights from a flax MLP param subtree."""
    return MLPWeights(
        w1=p["Dense_0"]["kernel"], b1=p["Dense_0"]["bias"],
        ln1_scale=p["LayerNorm_0"]["scale"], ln1_bias=p["LayerNorm_0"]["bias"],
        w2=p["Dense_1"]["kernel"], b2=p["Dense_1"]["bias"],
        ln2_scale=p["LayerNorm_1"]["scale"], ln2_bias=p["LayerNorm_1"]["bias"],
        w3=p["Dense_2"]["kernel"], b3=p["Dense_2"]["bias"],
    )


def _ln_silu_block(h, scale, bias):
    """LayerNorm -> SiLU, the elementwise segment between the MLP dots."""
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
    l = (h - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias
    return jax.nn.silu(l)


# remat variant: under jax.linearize the tangent program RECOMPUTES the LN
# statistics / sigmoid from the (possibly bf16) input instead of saving
# several f32-elementwise residual tensors — per-lane HBM reads become
# cheap VPU arithmetic, which is the right trade on the HBM-bound
# divergence path (the 3N tangent lanes re-read every residual).
_ln_silu_remat = jax.checkpoint(_ln_silu_block)


def _ln_silu_block_agg(h, scale, bias):
    """LN -> SiLU with f32 statistics but low-precision storage: the input
    stays bf16 in HBM, the f32 upcast/stats/normalize are one fused
    elementwise segment, and the output is written back in the input dtype.
    Used by the aggressive bf16 profile (bf16_out=True below)."""
    h32 = h.astype(jnp.float32)
    mu = jnp.mean(h32, axis=-1, keepdims=True)
    var = jnp.mean((h32 - mu) ** 2, axis=-1, keepdims=True)
    l = (h32 - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias
    return jax.nn.silu(l).astype(h.dtype)


def _mlp_block(
    x, w: MLPWeights, compute_dtype=None, remat_ln: bool = False,
    bf16_out: bool = False,
):
    """The MLP body on a VMEM tile (shared by kernel and reference).

    ``compute_dtype=jnp.bfloat16`` feeds the three matmuls bf16 operands
    (params are cast at the dot, activations once after each LN+SiLU) while
    every dot still accumulates into f32 (``preferred_element_type``) and
    the LayerNorm statistics stay f32. This is the mixed-precision profile
    for the HBM-bound divergence tangents (see models/cpainn_dense.py).
    ``remat_ln`` swaps the LN->SiLU segments for their checkpointed form
    (residuals = segment inputs only; see _ln_silu_remat).
    ``bf16_out`` is the aggressive profile: dot OUTPUTS are stored in the
    compute dtype too (MXU still accumulates f32 internally), biases are
    cast so the add does not re-promote, and LN statistics are computed in
    a fused f32 segment over bf16-stored activations — halving the HBM
    footprint of every hidden activation (and of its tangent under
    jax.linearize).
    """
    cd = compute_dtype
    if bf16_out and cd is not None:
        def c(a):
            return a.astype(cd)

        h = jnp.dot(c(x), c(w.w1)) + c(w.b1)
        h = _ln_silu_block_agg(h, w.ln1_scale, w.ln1_bias)
        h = jnp.dot(h, c(w.w2)) + c(w.b2)
        h = _ln_silu_block_agg(h, w.ln2_scale, w.ln2_bias)
        return jnp.dot(h, c(w.w3)) + c(w.b3)

    ln_silu = _ln_silu_remat if remat_ln else _ln_silu_block

    def c(a):
        return a.astype(cd) if cd is not None else a

    h = jnp.dot(c(x), c(w.w1), preferred_element_type=jnp.float32) + w.b1
    h = ln_silu(h, w.ln1_scale, w.ln1_bias)
    h = jnp.dot(c(h), c(w.w2), preferred_element_type=jnp.float32) + w.b2
    h = ln_silu(h, w.ln2_scale, w.ln2_bias)
    return jnp.dot(c(h), c(w.w3), preferred_element_type=jnp.float32) + w.b3


def fused_edge_mlp_reference(in_feat: Array, pe: Array, phi: MLPWeights, w: MLPWeights) -> Array:
    """Pure-jnp reference of the fused kernel (same math as flax MLPs)."""
    return _mlp_block(in_feat, phi) * _mlp_block(pe, w)


def _ln_silu_jvp(h, dh, scale, bias):
    """(LayerNorm -> SiLU) with its JVP, recompute-style (no residuals)."""
    mu = jnp.mean(h, axis=-1, keepdims=True)
    cen = h - mu
    var = jnp.mean(cen**2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    xhat = cen * rstd
    l = xhat * scale + bias

    dmu = jnp.mean(dh, axis=-1, keepdims=True)
    dcen = dh - dmu
    dvar = 2.0 * jnp.mean(cen * dh, axis=-1, keepdims=True)
    drstd = -0.5 * rstd * rstd * rstd * dvar
    dl = (dcen * rstd + cen * drstd) * scale

    sig = jax.nn.sigmoid(l)
    a = l * sig
    da = sig * (1.0 + l * (1.0 - sig)) * dl
    return a, da


def _mlp_block_jvp(x, dx, w: MLPWeights):
    """(out, dout) of the reference MLP under input tangent dx.

    Tangent-of-weights is zero by construction (the divergence/dlogp path
    differentiates w.r.t. coordinates only). Shares every primal
    intermediate with the tangent chain — usable on a VMEM tile inside a
    Pallas kernel and as the pure-jnp reference for tests.
    """
    h = jnp.dot(x, w.w1, preferred_element_type=jnp.float32) + w.b1
    dh = jnp.dot(dx, w.w1, preferred_element_type=jnp.float32)
    a, da = _ln_silu_jvp(h, dh, w.ln1_scale, w.ln1_bias)
    h = jnp.dot(a, w.w2, preferred_element_type=jnp.float32) + w.b2
    dh = jnp.dot(da, w.w2, preferred_element_type=jnp.float32)
    a, da = _ln_silu_jvp(h, dh, w.ln2_scale, w.ln2_bias)
    out = jnp.dot(a, w.w3, preferred_element_type=jnp.float32) + w.b3
    dout = jnp.dot(da, w.w3, preferred_element_type=jnp.float32)
    return out, dout


def edge_mlp_jvp_reference(in_feat, pe, din, dpe, phi: MLPWeights, w: MLPWeights):
    """Tangent of fused_edge_mlp_reference under (din, dpe) — pure jnp."""
    p, dp = _mlp_block_jvp(in_feat, din, phi)
    q, dq = _mlp_block_jvp(pe, dpe, w)
    return dp * q + p * dq


def _kernel(in_ref, pe_ref, *refs):
    phi_vals = MLPWeights(*(r[:] for r in refs[:10]))
    w_vals = MLPWeights(*(r[:] for r in refs[10:20]))
    out_ref = refs[20]
    out_ref[:] = _mlp_block(in_ref[:], phi_vals) * _mlp_block(pe_ref[:], w_vals)


def fused_edge_mlp(
    in_feat: Array,
    pe: Array,
    phi: MLPWeights,
    w: MLPWeights,
    *,
    tile: int = 256,
    interpret: bool = False,
) -> Array:
    """phi(in_feat) * w(pe) with all intermediates in VMEM.

    in_feat: (R, 2F), pe: (R, F) -> (R, 5F). R is padded to the tile size
    internally. Inference-only (no autodiff rules).
    """
    r, f_in = in_feat.shape
    f_out = phi.w3.shape[1]
    r_pad = -(-r // tile) * tile
    if r_pad != r:
        in_feat = jnp.pad(in_feat, ((0, r_pad - r), (0, 0)))
        pe = jnp.pad(pe, ((0, r_pad - r), (0, 0)))

    # keep every weight 2-D (TPU tiling prefers >=2-D refs)
    def as2d(a):
        return a[None, :] if a.ndim == 1 else a

    phi2 = MLPWeights(*(as2d(a) for a in phi))
    w2 = MLPWeights(*(as2d(a) for a in w))

    grid = (r_pad // tile,)
    row_spec = lambda width: pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full_spec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    weight_specs = [full_spec(wt.shape) for wt in (*phi2, *w2)]

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[row_spec(in_feat.shape[1]), row_spec(pe.shape[1])] + weight_specs,
        out_specs=row_spec(f_out),
        out_shape=jax.ShapeDtypeStruct((r_pad, f_out), in_feat.dtype),
        interpret=interpret,
    )(in_feat, pe, *phi2, *w2)
    return out[:r]


def _edge_jvp_kernel(in_ref, pe_ref, din_ref, dpe_ref, *refs):
    phi_vals = MLPWeights(*(r[:] for r in refs[:10]))
    w_vals = MLPWeights(*(r[:] for r in refs[10:20]))
    out_ref = refs[20]
    p, dp = _mlp_block_jvp(in_ref[:], din_ref[:], phi_vals)
    q, dq = _mlp_block_jvp(pe_ref[:], dpe_ref[:], w_vals)
    out_ref[:] = dp * q + p * dq


def fused_edge_mlp_jvp(
    in_feat: Array,
    pe: Array,
    din: Array,
    dpe: Array,
    phi: MLPWeights,
    w: MLPWeights,
    *,
    tile: int = 128,
    interpret: bool = False,
) -> Array:
    """Tangent of ``fused_edge_mlp`` under input tangents, fused in VMEM.

    Recomputes the primal chains on the tile instead of reading residuals
    from HBM: the divergence path evaluates 3N tangent lanes against ONE
    primal, so HBM-resident residuals would be read 3N times — recompute
    trades ~2x tile FLOPs (MXU headroom) for ~4x less HBM traffic, which is
    what bounds the exact-dlogp hot loop (scripts/profile_divergence.py).
    """
    r, f_in = in_feat.shape
    f_out = phi.w3.shape[1]
    r_pad = -(-r // tile) * tile
    if r_pad != r:
        pad = ((0, r_pad - r), (0, 0))
        in_feat, pe = jnp.pad(in_feat, pad), jnp.pad(pe, pad)
        din, dpe = jnp.pad(din, pad), jnp.pad(dpe, pad)

    def as2d(a):
        return a[None, :] if a.ndim == 1 else a

    phi2 = MLPWeights(*(as2d(a) for a in phi))
    w2 = MLPWeights(*(as2d(a) for a in w))
    grid = (r_pad // tile,)
    row_spec = lambda width: pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full_spec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _edge_jvp_kernel,
        grid=grid,
        in_specs=[
            row_spec(in_feat.shape[1]), row_spec(pe.shape[1]),
            row_spec(din.shape[1]), row_spec(dpe.shape[1]),
        ] + [full_spec(t.shape) for t in (*phi2, *w2)],
        out_specs=row_spec(f_out),
        out_shape=jax.ShapeDtypeStruct((r_pad, f_out), in_feat.dtype),
        interpret=interpret,
    )(in_feat, pe, din, dpe, *phi2, *w2)
    return out[:r]


@functools.lru_cache(maxsize=None)
def fused_edge_mlp_diff(tile: int = 128, interpret: bool = False):
    """Differentiable fused edge-MLP: ``f(in_feat, pe, phi, w) -> (R, 5F)``.

    Forward = the fused Pallas kernel; JVP w.r.t. (in_feat, pe) = the fused
    tangent kernel. Under ``jax.linearize`` the primal is hoisted and only
    the tangent kernel runs per lane, so the exact-divergence path gets the
    VMEM fusion end to end. Tangents w.r.t. the WEIGHTS fall back to
    ``jax.jvp`` of the jnp reference (training differentiates params via the
    flax module, not this path — the fallback keeps autodiff correct if it
    is ever reached). No transpose rule: reverse-mode (grad) must not cross
    this function; use the jnp composition for training losses.
    """

    @jax.custom_jvp
    def f(in_feat, pe, phi, w):
        return fused_edge_mlp(in_feat, pe, phi, w, tile=tile, interpret=interpret)

    @functools.partial(f.defjvp, symbolic_zeros=True)
    def f_jvp(primals, tangents):
        in_feat, pe, phi, w = primals
        din, dpe, dphi, dw = tangents

        def is_zero(t):
            return isinstance(t, jax.custom_derivatives.SymbolicZero)

        def inst(t, like):
            return jnp.zeros(like.shape, like.dtype) if is_zero(t) else t

        out = fused_edge_mlp(in_feat, pe, phi, w, tile=tile, interpret=interpret)
        weight_tans = jax.tree.leaves((dphi, dw), is_leaf=is_zero)
        if any(not is_zero(t) for t in weight_tans):
            # full-generality fallback (never hit on the sampling paths)
            _, dout = jax.jvp(
                fused_edge_mlp_reference,
                (in_feat, pe, phi, w),
                (
                    inst(din, in_feat), inst(dpe, pe),
                    jax.tree.map(inst, dphi, phi, is_leaf=is_zero),
                    jax.tree.map(inst, dw, w, is_leaf=is_zero),
                ),
            )
            return out, dout
        dout = fused_edge_mlp_jvp(
            in_feat, pe, inst(din, in_feat), inst(dpe, pe), phi, w,
            tile=tile, interpret=interpret,
        )
        return out, dout

    return f


def _single_mlp_kernel(x_ref, *refs):
    w_vals = MLPWeights(*(r[:] for r in refs[:10]))
    out_ref = refs[10]
    out_ref[:] = _mlp_block(x_ref[:], w_vals)


def fused_mlp(
    x: Array,
    w: MLPWeights,
    *,
    tile: int = 256,
    interpret: bool = False,
) -> Array:
    """Single reference-style MLP (Dense-LN-SiLU x2 -> Dense) with all
    intermediates in VMEM. x: (R, f_in) -> (R, f_out). Inference-only."""
    r = x.shape[0]
    f_out = w.w3.shape[1]
    r_pad = -(-r // tile) * tile
    if r_pad != r:
        x = jnp.pad(x, ((0, r_pad - r), (0, 0)))

    def as2d(a):
        return a[None, :] if a.ndim == 1 else a

    w2 = MLPWeights(*(as2d(a) for a in w))
    grid = (r_pad // tile,)
    row_spec = lambda width: pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full_spec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _single_mlp_kernel,
        grid=grid,
        in_specs=[row_spec(x.shape[1])] + [full_spec(t.shape) for t in w2],
        out_specs=row_spec(f_out),
        out_shape=jax.ShapeDtypeStruct((r_pad, f_out), x.dtype),
        interpret=interpret,
    )(x, *w2)
    return out[:r]
