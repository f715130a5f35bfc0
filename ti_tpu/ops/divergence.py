"""Divergence (Jacobian-trace) estimators for probability-flow dlogp.

The reference computes div(b) with one ``torch.autograd.grad`` per state
dimension inside every ODE RHS evaluation — 3·n_atoms full GNN backward
passes per step (mdqm9/thermo/ambient/models/ode_wrapper.py:60-91,
adw/thermo/models/ode_wrapper.py:54-67), which dominates its wall-clock.

TPU-native replacements:

- ``divergence_exact``: trace(J) via forward-mode JVPs against the identity
  basis, vmapped so all D tangents evaluate in one batched forward. For the
  systems here (D = 3·n_atoms ≤ ~90, D = 1 for ADW) this is exact and cheap,
  and XLA fuses the batched tangent evaluation with the primal.
- ``divergence_hutchinson``: unbiased stochastic trace estimator
  E_z[zᵀ J z] with Rademacher probes, K vmapped JVPs — O(K) instead of O(D)
  for larger systems.

Both return the primal velocity too, so the ODE step costs a single fused
evaluation. The reference's 1e-2/1e2 divergence scaling hack
(adw/thermo/models/ode_wrapper.py:67, adw/thermo/integrators.py:68) — a
conditioning trick for torchdiffeq's per-state adaptive tolerances — is
dropped: it cancels exactly (div·1e-2 integrated, then dlogp·1e2) and our
fixed-step/scan integrators don't need it.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
VelocityFn = Callable[[Array], Array]  # x -> dx/dt, closed over (params, t, cond)


def value_and_divergence(
    f: VelocityFn,
    x: Array,
    *,
    mode: str = "exact",
    key: Array | None = None,
    num_probes: int = 8,
    chunk: int | None = None,
) -> Tuple[Array, Array]:
    """Return (f(x), div f(x)) with the chosen estimator.

    ``x`` may have any shape; the divergence is over all of its elements
    (flattened). ``mode`` in {"exact", "hutchinson"}.
    """
    if mode == "exact":
        return divergence_exact(f, x, chunk=chunk)
    if mode == "hutchinson":
        if key is None:
            raise ValueError("hutchinson mode requires a PRNG key")
        return divergence_hutchinson(f, x, key, num_probes=num_probes)
    raise ValueError(f"unknown divergence mode {mode!r}")


def divergence_exact(f: VelocityFn, x: Array, chunk: int | None = None) -> Tuple[Array, Array]:
    """Exact trace of the Jacobian of f at x.

    Matches the reference's exact autograd-loop divergence
    (adw/thermo/models/ode_wrapper.py:54-67) but via ``jax.linearize``: the
    primal is evaluated ONCE and the D tangent passes go through the
    (cheap, linear) tangent program — versus the reference's D full
    backward passes per evaluation.

    ``chunk`` bounds the number of tangent lanes evaluated at once (a
    ``lax.map`` over ceil(D/chunk) vmapped blocks): per-lane activations for
    a GNN are O(E·F), so on-HBM memory scales with chains × lanes — chunking
    trades a little latency for a hard memory bound. None = all D at once.
    """
    shape = jnp.shape(x)
    d = int(jnp.size(x))
    flat = jnp.reshape(x, (d,))

    def f_flat(xf):
        return jnp.reshape(f(jnp.reshape(xf, shape)), (d,))

    y, f_lin = jax.linearize(f_flat, flat)

    if chunk is None or chunk >= d:
        basis = jnp.eye(d, dtype=flat.dtype)
        diag = jax.vmap(lambda e: jnp.vdot(e, f_lin(e)))(basis)
        return jnp.reshape(y, shape), jnp.sum(diag)

    n_chunks = -(-d // chunk)
    pad = n_chunks * chunk
    basis = jnp.eye(d, pad, dtype=flat.dtype).T.reshape(n_chunks, chunk, d)

    def block(es):
        return jnp.sum(jax.vmap(lambda e: jnp.vdot(e, f_lin(e)))(es))

    partial = jax.lax.map(block, basis)
    return jnp.reshape(y, shape), jnp.sum(partial)


def divergence_hutchinson(
    f: VelocityFn, x: Array, key: Array, *, num_probes: int = 8
) -> Tuple[Array, Array]:
    """Hutchinson estimator: div f ≈ mean_k z_kᵀ J z_k, z Rademacher."""
    shape = jnp.shape(x)
    d = int(jnp.size(x))
    flat = jnp.reshape(x, (d,))

    def f_flat(xf):
        return jnp.reshape(f(jnp.reshape(xf, shape)), (d,))

    z = jax.random.rademacher(key, (num_probes, d), dtype=flat.dtype)
    y, f_lin = jax.linearize(f_flat, flat)
    est = jax.vmap(lambda zk: jnp.vdot(zk, f_lin(zk)))(z)
    return jnp.reshape(y, shape), jnp.mean(est)
