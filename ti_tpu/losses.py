"""Antithetic interpolant-regression (velocity) losses.

Pure-functional counterparts of the reference loss modules:
- ADW StandardVelocityLoss (adw/thermo/losses.py:8-57)
- MDQM9 ambient StandardVelocityLoss (mdqm9/thermo/ambient/losses.py:30-133)
- MDQM9 latent OneSidedVelocityLoss (mdqm9/thermo/latent/losses.py:30-121)

Each is ``loss(params, key, batch) -> scalar`` so it composes directly with
``jax.value_and_grad`` / ``pjit``. The reference's ``torch.vmap`` of a
per-sample loss plus batch-object surgery (losses.py:58-77) is replaced by
plain broadcasting; the quadratic objective is identical:

    L = mean[ 0.5|b_+|^2 - (dtIt + gamma_dot z)·b_+
            + 0.5|b_-|^2 - (dtIt - gamma_dot z)·b_- ]         (two-sided)
    L = mean[ 0.5|b_+|^2 - dtIt·b_+ ]                          (one-sided)

Notes kept from the reference:
- molecular t is drawn per molecule and shared across its atoms
  (ambient/losses.py:45-49), Uniform or Beta(0.5, 0.5) (latent: Beta(2, 1)).
- x_t^± are mean-centered over ALL atoms of the whole batch (not per
  molecule), exactly like ``xtp - xtp.mean(dim=0)`` on the flattened PyG
  batch (ambient/losses.py:55-56).
- the reference's one-sided loss evaluates the model on x_t^- but never uses
  it (latent/losses.py:114-121); we skip that dead forward pass.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ti_tpu.interpolants import Interpolant
from ti_tpu.models.cpainn import MolGraph

Array = jax.Array


def _sample_t(key: Array, shape, t_distr: str, dtype) -> Array:
    if t_distr == "uniform":
        return jax.random.uniform(key, shape, dtype=dtype)
    if t_distr == "beta":  # ambient Beta(0.5, 0.5) (ambient/losses.py:47-49)
        return jax.random.beta(key, 0.5, 0.5, shape).astype(dtype)
    if t_distr == "beta21":  # latent Beta(2, 1) (latent/losses.py:47-50)
        return jax.random.beta(key, 2.0, 1.0, shape).astype(dtype)
    raise ValueError(f"unknown t distribution {t_distr!r}")


def adw_velocity_loss(
    apply_fn: Callable[..., Array],
    params,
    key: Array,
    x0: Array,
    x1: Array,
    beta0: Array,
    beta1: Array,
    interpolant: Interpolant,
    t: Array | None = None,
    z: Array | None = None,
) -> Array:
    """Two-sided antithetic velocity loss for the ADW MLP.

    x0, x1: (B, D); beta0, beta1: (B, 1). Matches reference
    StandardVelocityLoss.loss_per_sample (adw/thermo/losses.py:47-57) with
    t ~ U(0,1) per sample (adw/thermo/utils.py:15).

    ``t``/``z`` pin the internal draws (shapes (B, 1) / (B, D)) — a
    determinism hook for golden parity against the reference loss, which
    draws via torch.rand/randn.
    """
    tkey, zkey = jax.random.split(key)
    if t is None:
        t = jax.random.uniform(tkey, (x0.shape[0], 1), dtype=x0.dtype)
    if z is None:
        xtp, xtm, z = interpolant.antithetic_xts(zkey, t, x0, x1)
    else:
        It, g = interpolant.It(t, x0, x1), interpolant.gamma(t)
        xtp, xtm = It + g * z, It - g * z

    btp = apply_fn(params, xtp, t, beta0, beta1)
    btm = apply_fn(params, xtm, t, beta0, beta1)

    dtIt = interpolant.dtIt(t, x0, x1)
    gd = interpolant.gamma_dot(t)
    per = (
        0.5 * jnp.sum(btp**2, axis=-1)
        - jnp.sum((dtIt + gd * z) * btp, axis=-1)
        + 0.5 * jnp.sum(btm**2, axis=-1)
        - jnp.sum((dtIt - gd * z) * btm, axis=-1)
    )
    return jnp.mean(per)


def molecular_velocity_loss(
    apply_fn: Callable[[object, MolGraph], Array],
    params,
    key: Array,
    graph: MolGraph,
    x0: Array,
    x1: Array,
    temps: Array,
    interpolant: Interpolant,
    t_distr: str = "uniform",
    remat: bool = False,
    batched_apply_fn: Callable[..., Array] | None = None,
    t: Array | None = None,
    z: Array | None = None,
) -> Array:
    """Antithetic velocity loss over a batch of molecules.

    graph: MolGraph template (static edges/atom_ids; its x/t/temps are
    overridden). x0, x1: (B, N, 3) endpoint coordinates. temps: (B, K)
    conditioning temperatures per molecule (K=2 ambient (T0,T1), K=1 latent,
    K=0 unconditioned).

    Two-sided when ``interpolant.one_sided`` is False (ambient,
    mdqm9/thermo/ambient/losses.py:30-133), one-sided otherwise (latent,
    mdqm9/thermo/latent/losses.py:114-121).

    ``batched_apply_fn(params, x (B,N,3), t (B,), temps (B,K)) -> (B,N,3)``
    replaces the vmapped per-molecule ``apply_fn`` when given — the dense
    (N x N) pair formulation (models/cpainn_dense.apply_dense), which is the
    sampling hot path and supports mixed-precision compute for training
    (config train_impl / train_compute_dtype).

    ``t``/``z`` pin the internal draws (shapes (B,) / (B, N, 3)) — a
    determinism hook for golden parity against the reference loss.
    ``z`` is ignored for one-sided interpolants (there z := x0).
    """
    b, n, _ = x0.shape
    tkey, zkey = jax.random.split(key)
    if t is None:
        t = _sample_t(tkey, (b,), t_distr, x0.dtype)  # per molecule
    t3 = t[:, None, None]

    if z is None or interpolant.one_sided:
        xtp, xtm, z = interpolant.antithetic_xts(zkey, t3, x0, x1)
    else:
        It, g = interpolant.It(t3, x0, x1), interpolant.gamma(t3)
        xtp, xtm = It + g * z, It - g * z
    # global mean-centering over ALL atoms in the batch (ambient/losses.py:55-56)
    xtp = xtp - jnp.mean(xtp.reshape(-1, 3), axis=0)
    xtm = xtm - jnp.mean(xtm.reshape(-1, 3), axis=0)

    if batched_apply_fn is not None:
        bfwd = lambda x_b, t_b, temps_b: batched_apply_fn(params, x_b, t_b, temps_b)
    else:
        def fwd(x_m, t_m, temps_m):
            g = MolGraph(x=x_m, atom_ids=graph.atom_ids, t=t_m, temps=temps_m, edges=graph.edges)
            return apply_fn(params, g)

        bfwd = jax.vmap(fwd)

    if remat:
        # trade one extra forward for the activation memory of the two
        # GNN forwards under reverse-mode grad — lifts the f32 batch-size
        # ceiling (batch 1024 OOMs without it, BASELINE.md training row)
        bfwd = jax.checkpoint(bfwd)

    btp = bfwd(xtp, t, temps)  # (B, N, 3)
    dtIt = interpolant.dtIt(t3, x0, x1)

    if interpolant.one_sided:
        per_atom = 0.5 * jnp.sum(btp**2, axis=-1) - jnp.sum(dtIt * btp, axis=-1)
        return jnp.mean(per_atom)

    btm = bfwd(xtm, t, temps)
    gd = interpolant.gamma_dot(t3)
    per_atom = (
        0.5 * jnp.sum(btp**2, axis=-1)
        - jnp.sum((dtIt + gd * z) * btp, axis=-1)
        + 0.5 * jnp.sum(btm**2, axis=-1)
        - jnp.sum((dtIt - gd * z) * btm, axis=-1)
    )
    return jnp.mean(per_atom)
