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


def _mlp_block(x, w: MLPWeights):
    """The MLP body on a VMEM tile (shared by kernel and reference)."""
    h = jnp.dot(x, w.w1, preferred_element_type=jnp.float32) + w.b1
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
    h = (h - mu) * jax.lax.rsqrt(var + 1e-5) * w.ln1_scale + w.ln1_bias
    h = jax.nn.silu(h)
    h = jnp.dot(h, w.w2, preferred_element_type=jnp.float32) + w.b2
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
    h = (h - mu) * jax.lax.rsqrt(var + 1e-5) * w.ln2_scale + w.ln2_bias
    h = jax.nn.silu(h)
    return jnp.dot(h, w.w3, preferred_element_type=jnp.float32) + w.b3


def fused_edge_mlp_reference(in_feat: Array, pe: Array, phi: MLPWeights, w: MLPWeights) -> Array:
    """Pure-jnp reference of the fused kernel (same math as flax MLPs)."""
    return _mlp_block(in_feat, phi) * _mlp_block(pe, w)


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
