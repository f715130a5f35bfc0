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
evaluation.

LANE SHARDING (``axis_name=``): the tangent lanes (identity basis columns
for exact, probes for Hutchinson) are mutually independent, so they shard
perfectly over a device-mesh axis — each device runs its slice of the
lanes through the shared linearization and the partial traces meet in ONE
scalar ``psum`` per evaluation (pure ICI latency, no bandwidth). Pass
``axis_name`` when calling from inside ``jax.shard_map`` over that mesh
axis; see ``ti_tpu.parallel.mesh.lane_parallel_sampler`` for the wrapper.
This is the intra-molecule (tensor-parallel-like) scaling axis: it cuts
the LATENCY of a single chain's dlogp, complementary to chain sharding's
throughput axis.

The reference's 1e-2/1e2 divergence scaling hack
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
    axis_name: str | None = None,
    probe_mode: str = "rademacher",
) -> Tuple[Array, Array]:
    """Return (f(x), div f(x)) with the chosen estimator.

    ``x`` may have any shape; the divergence is over all of its elements
    (flattened). ``mode`` in {"exact", "hutchinson"}. ``axis_name`` shards
    the tangent lanes over that mesh axis (inside shard_map only).
    ``probe_mode`` selects the hutchinson probe distribution
    (rademacher | orthogonal; see ``divergence_hutchinson``).
    """
    if mode == "exact":
        return divergence_exact(f, x, chunk=chunk, axis_name=axis_name)
    if mode == "hutchinson":
        if key is None:
            raise ValueError("hutchinson mode requires a PRNG key")
        return divergence_hutchinson(
            f, x, key, num_probes=num_probes, axis_name=axis_name,
            probe_mode=probe_mode,
        )
    if mode == "hutchpp":
        if key is None:
            raise ValueError("hutchpp mode requires a PRNG key")
        if axis_name is not None:
            raise NotImplementedError(
                "axis_name lane sharding is not implemented for hutchpp "
                "(the sketch QR needs the full query basis)"
            )
        return divergence_hutchpp(f, x, key, num_queries=num_probes)
    raise ValueError(f"unknown divergence mode {mode!r}")


def divergence_exact(
    f: VelocityFn,
    x: Array,
    chunk: int | None = None,
    axis_name: str | None = None,
) -> Tuple[Array, Array]:
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

    ``axis_name`` (inside ``jax.shard_map`` only) shards the lanes over
    that mesh axis: each device evaluates its ceil(D/n)-lane slice of the
    identity basis (zero-padded rows beyond D contribute exactly 0) and the
    trace is completed with one scalar ``lax.psum``. The primal is
    replicated compute (1 forward vs D/n tangents — negligible). ``chunk``
    then bounds the PER-DEVICE lanes.
    """
    shape = jnp.shape(x)
    d = int(jnp.size(x))
    flat = jnp.reshape(x, (d,))

    def f_flat(xf):
        return jnp.reshape(f(jnp.reshape(xf, shape)), (d,))

    y, f_lin = jax.linearize(f_flat, flat)

    if axis_name is not None:
        n = jax.lax.axis_size(axis_name)
        per = -(-d // n)
        rows = jax.lax.axis_index(axis_name) * per + jnp.arange(per)
        basis = (rows[:, None] == jnp.arange(d)[None, :]).astype(flat.dtype)
        part = _lane_trace(f_lin, basis, chunk)
        return jnp.reshape(y, shape), jax.lax.psum(part, axis_name)

    if chunk is None or chunk >= d:
        basis = jnp.eye(d, dtype=flat.dtype)
        diag = jax.vmap(lambda e: jnp.vdot(e, f_lin(e)))(basis)
        return jnp.reshape(y, shape), jnp.sum(diag)

    return jnp.reshape(y, shape), _lane_trace(f_lin, jnp.eye(d, dtype=flat.dtype), chunk)


def _lane_trace(f_lin, basis: Array, chunk: int | None) -> Array:
    """sum_e e·f_lin(e) over basis rows, optionally in chunk-lane blocks."""
    m = basis.shape[0]
    if chunk is None or chunk >= m:
        return jnp.sum(jax.vmap(lambda e: jnp.vdot(e, f_lin(e)))(basis))
    n_chunks = -(-m // chunk)
    pad = n_chunks * chunk
    blocks = jnp.pad(basis, ((0, pad - m), (0, 0))).reshape(n_chunks, chunk, -1)

    def block(es):
        return jnp.sum(jax.vmap(lambda e: jnp.vdot(e, f_lin(e)))(es))

    return jnp.sum(jax.lax.map(block, blocks))


def _probe_block(key, k: int, d: int, dtype, mode: str) -> Tuple[Array, Array]:
    """(k, d) probe rows Z and per-row weights w with E[Zᵀ diag(w) Z] = I.

    ``rademacher``: iid ±1 rows, w = 1/k (the classic Hutchinson draw).
    ``orthogonal``: k ≤ d Haar-orthonormal rows (QR of a Gaussian, signs
    fixed so the distribution is exactly Haar), w = d/k. Unbiased for any
    J because E[QᵀQ] = (k/d)·I for Haar frames, and EXACT at k = d (then
    QᵀQ = I, so Σ d/k·q_iᵀJq_i = tr(J) identically): the estimator
    variance carries a without-replacement factor ~(d−k)/(d−1) that plain
    iid probes lack, so it interpolates smoothly to the exact trace as the
    probe budget approaches the dimension.
    """
    if mode == "rademacher":
        z = jax.random.rademacher(key, (k, d), dtype=dtype)
        return z, jnp.full((k,), 1.0 / k, dtype)
    if mode == "orthogonal":
        if k > d:
            raise ValueError(
                f"orthogonal probe_mode needs num_probes <= dim ({k} > {d}); "
                "use num_probes=dim (exact) or probe_mode='rademacher'"
            )
        # QR in f32 regardless of the compute dtype (low-precision QR is
        # unsupported/ill-conditioned on some backends); probes cast back
        g = jax.random.normal(key, (d, k), dtype=jnp.float32)
        q, r = jnp.linalg.qr(g)
        # sign-fix the QR so columns are Haar-distributed (otherwise the
        # factorization's sign convention biases the frame)
        q = (q * jnp.sign(jnp.diagonal(r))[None, :]).astype(dtype)
        return q.T, jnp.full((k,), d / k, dtype)
    raise ValueError(f"unknown probe_mode {mode!r} (rademacher | orthogonal)")


def hutchinson_var_estimate(est: Array, w: Array, d: int, mode: str) -> Array:
    """Plug-in variance of the Hutchinson trace ESTIMATOR from its K
    per-probe contributions ``est`` (q_k = z_k^T J z_k) and weights ``w``.

    rademacher (w = 1/K): the estimator is the mean of iid q_k, so
    Var = S^2/K with S^2 the sample variance. orthogonal (w = d/K): the
    Haar frame's without-replacement factor (d-K)/(d-1) is applied to the
    iid plug-in — approximate (the q_k are negatively correlated), exact
    in the K = d limit (variance 0). Downstream use: the probe noise adds
    ~N(0, var) to dlogp, which biases -log E[e^{-phi}] by ~var/2 — the
    log-normal debias phi += var/2 removes it
    (analysis/free_energy-level knob; BASELINE.md 10506 probe rows)."""
    k = est.shape[0]
    s2 = jnp.var(est) * (k / max(k - 1, 1))
    if mode == "orthogonal":
        fac = (d - k) / max(d - 1, 1)
        return (jnp.sum(w) ** 2) * s2 / k * fac
    return s2 / k


def divergence_hutchinson(
    f: VelocityFn,
    x: Array,
    key: Array,
    *,
    num_probes: int = 8,
    axis_name: str | None = None,
    probe_mode: str = "rademacher",
    return_var: bool = False,
) -> Tuple[Array, ...]:
    """Hutchinson estimator: div f ≈ Σ_k w_k z_kᵀ J z_k.

    ``probe_mode`` selects the probe distribution (see ``_probe_block``):
    iid Rademacher (default, the classic estimator) or a Haar-orthonormal
    probe frame scaled by d/K — unbiased for any J and exact at K = dim,
    with a without-replacement variance factor ~(dim−K)/(dim−1).

    ``axis_name`` (inside ``jax.shard_map`` only) shards the probes over
    that mesh axis: each device draws ceil(K/n) probes from
    ``fold_in(key, axis_index)`` and the mean is completed with one scalar
    ``psum`` over n·ceil(K/n) total probes. Still unbiased (probe blocks
    are iid across devices; orthogonal mode orthogonalizes per shard), but
    the draws differ from the unsharded estimator — no bitwise parity
    across lane-mesh shapes.

    ``return_var`` additionally returns the plug-in estimator variance
    (``hutchinson_var_estimate``) as a third element — the debias input
    for exp(-phi) consumers. Not supported with ``axis_name``.
    """
    shape = jnp.shape(x)
    d = int(jnp.size(x))
    flat = jnp.reshape(x, (d,))

    def f_flat(xf):
        return jnp.reshape(f(jnp.reshape(xf, shape)), (d,))

    y, f_lin = jax.linearize(f_flat, flat)

    if axis_name is not None:
        if return_var:
            raise NotImplementedError(
                "return_var is not supported with axis_name lane sharding"
            )
        n = jax.lax.axis_size(axis_name)
        per = -(-num_probes // n)
        if probe_mode == "orthogonal" and per > d:
            # report in the caller's terms: _probe_block sees only the
            # per-shard count, which is not what the user passed
            raise ValueError(
                f"orthogonal probe_mode over axis {axis_name!r} draws "
                f"ceil({num_probes}/{n}) = {per} probes per shard but dim "
                f"is only {d}; use num_probes <= {n * d} (per-shard frames "
                "are orthogonalized locally) or probe_mode='rademacher'"
            )
        k_local = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        z, w = _probe_block(k_local, per, d, flat.dtype, probe_mode)
        part = jnp.sum(w * jax.vmap(lambda zk: jnp.vdot(zk, f_lin(zk)))(z))
        return jnp.reshape(y, shape), jax.lax.psum(part, axis_name) / n

    z, w = _probe_block(key, num_probes, d, flat.dtype, probe_mode)
    est = jax.vmap(lambda zk: jnp.vdot(zk, f_lin(zk)))(z)
    if return_var:
        return (
            jnp.reshape(y, shape),
            jnp.sum(w * est),
            hutchinson_var_estimate(est, w, d, probe_mode),
        )
    return jnp.reshape(y, shape), jnp.sum(w * est)


def divergence_hutchpp(
    f: VelocityFn,
    x: Array,
    key: Array,
    *,
    num_queries: int = 12,
    sketch: int | None = None,
) -> Tuple[Array, Array]:
    """Hutch++ trace estimator (Meyer et al. 2021) on the velocity Jacobian.

    Splits the ``num_queries`` JVP lanes into a low-rank SKETCH whose trace
    contribution is computed EXACTLY, plus Hutchinson probes on the
    projected residual:

        tr(J) = tr(Qᵀ J Q) + E_g[ gᵀ(I-QQᵀ) J (I-QQᵀ)g ],   Q = qr(J S)

    with S an (s, D) Rademacher sketch. Unbiased for ANY square J (the
    projector is idempotent, so tr((I-P)J(I-P)) = tr((I-P)J) by
    cyclicity), and EXACT when rank(J) <= s. For Jacobians of smooth
    trained fields the spectrum decays, so the sketch captures most of the
    trace-mass and the residual variance drops ~quadratically in the query
    budget vs plain Hutchinson's O(1/K) variance — equal ESS at fewer
    tangent lanes (the cost driver; BASELINE.md probe-study rows).

    Lane budget: s sketch JVPs + s exact-term JVPs + (num_queries - 2s)
    residual probes = ``num_queries`` total linearized passes plus one
    (D, s) QR (trivial at D = 3N). Default split s = num_queries // 3 per
    the paper. No reference counterpart (the reference only has the exact
    autograd loop, adw/thermo/models/ode_wrapper.py:54-67).
    """
    shape = jnp.shape(x)
    d = int(jnp.size(x))
    flat = jnp.reshape(x, (d,))
    s = sketch if sketch is not None else max(1, num_queries // 3)
    m = num_queries - 2 * s
    if m < 1:
        raise ValueError(
            f"num_queries={num_queries} too small for sketch s={s} "
            "(need num_queries >= 2*s + 1)"
        )

    def f_flat(xf):
        return jnp.reshape(f(jnp.reshape(xf, shape)), (d,))

    y, f_lin = jax.linearize(f_flat, flat)

    k_s, k_g = jax.random.split(key)
    S = jax.random.rademacher(k_s, (s, d), dtype=flat.dtype)
    AS = jax.vmap(f_lin)(S)  # rows J s_i
    q, _ = jnp.linalg.qr(AS.T)  # (d, s) orthonormal basis of range(J S)
    AQ = jax.vmap(f_lin)(q.T)  # rows J q_i
    t_sketch = jnp.sum(q.T * AQ)  # tr(Qᵀ J Q)

    g = jax.random.rademacher(k_g, (m, d), dtype=flat.dtype)
    g_perp = g - (g @ q) @ q.T  # (I - QQᵀ) g
    resid = jax.vmap(lambda z: jnp.vdot(z, f_lin(z)))(g_perp)
    return jnp.reshape(y, shape), t_sketch + jnp.mean(resid)
