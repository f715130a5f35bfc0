"""Probability-flow ODE / SDE samplers as ``lax.scan`` loops.

TPU-native replacement for the reference's torchdiffeq-based integrators
(adw/thermo/integrators.py:11-68, mdqm9/thermo/ambient/integrators.py:8-68,
mdqm9/thermo/latent/integrators.py:8-89) and ODE wrappers
(adw/thermo/models/ode_wrapper.py, mdqm9/thermo/*/models/ode_wrapper.py):

- The joint (x, dlogp) system is integrated in one fused RHS: a single
  velocity evaluation plus a batched-JVP divergence (ops/divergence.py),
  instead of the reference's 1 forward + 3N backward passes per eval.
- Fixed-step Euler / Heun / RK4 via ``lax.scan`` (static shapes, jits once,
  vmaps over thousands of chains).
- An in-repo adaptive Dormand–Prince 5(4) (``sample_ode_dopri5``) for parity
  with the reference's dopri5 at atol=rtol=1e-5; implemented as a bounded
  ``while_loop`` per save interval so it remains vmappable.
- Euler–Maruyama SDE (``sample_sde``) for stochastic sampling of the
  interpolant flow.

The reference's 1e-2 divergence scaling and matching 1e2 dlogp rescale
(adw/thermo/models/ode_wrapper.py:67, adw/thermo/integrators.py:68) — a
torchdiffeq per-state-tolerance conditioning hack — cancel exactly and are
dropped; ``sample_ode_dopri5`` instead controls error on the raw joint state.

Sign conventions match the reference ODEWrapper (forward: d(dlogp)/dt =
-div b; reverse: negated field, +div), so "dlogp" here is the change in
log-density along the transport, and the analysis-layer "neg_dlogps" is its
negation as in the reference results scripts.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ti_tpu.ops.divergence import divergence_exact, divergence_hutchinson

Array = jax.Array
VelocityFn = Callable[[Array, Array], Array]  # (x, t) -> dx/dt


class ODESolution(NamedTuple):
    """xs: (n_save, *state) trajectory at save points (including t0);
    dlogp: (n_save,) integrated log-density change (zeros if not requested);
    nfe: scalar int32 — number of RHS evaluations (the reference's printed
    ``n_steps`` counter, mdqm9/sample_ambient.py:107)."""

    xs: Array
    dlogp: Array
    nfe: Array


def _make_rhs(
    v_fn: VelocityFn,
    return_dlogp: bool,
    divergence: str,
    key: Optional[Array],
    num_probes: int,
):
    """RHS of the joint (x, dlogp) system: (b, -div b).

    Reverse transport is simply integration with t0 > t1 (negative dt flips
    both signs automatically, matching the reference's reverse_ode
    (-b, +div) convention, mdqm9/thermo/ambient/models/ode_wrapper.py:49).
    ``eval_idx`` folds RNG so each hutchinson evaluation gets fresh probes.
    """

    def rhs(x, t, eval_idx):
        if not return_dlogp:
            return v_fn(x, t), jnp.zeros((), dtype=x.dtype)
        f = lambda xx: v_fn(xx, t)
        if divergence == "exact":
            vel, div = divergence_exact(f, x)
        else:
            k = jax.random.fold_in(key, eval_idx)
            vel, div = divergence_hutchinson(f, x, k, num_probes=num_probes)
        return vel, -div

    return rhs


_METHOD_NFE = {"euler": 1, "heun": 2, "rk4": 4}


def sample_ode(
    v_fn: VelocityFn,
    x0: Array,
    *,
    t0: float = 0.0,
    t1: float = 1.0,
    n_steps: int = 100,
    n_save: int = 2,
    method: str = "rk4",
    return_dlogp: bool = True,
    divergence: str = "exact",
    key: Optional[Array] = None,
    num_probes: int = 8,
) -> ODESolution:
    """Fixed-step probability-flow ODE with fused dlogp carry.

    Integrates dx/dt = b(x, t), d(dlogp)/dt = -div b from t0 to t1 in
    ``n_steps`` uniform steps, saving ``n_save`` states at uniform times
    (n_steps must be a multiple of n_save - 1). Reverse transport: pass
    t0=1.0, t1=0.0. Single chain; wrap in ``jax.vmap`` for batches.
    """
    if n_save < 2 or n_steps % (n_save - 1) != 0:
        raise ValueError("n_steps must be a positive multiple of (n_save - 1)")
    if return_dlogp and divergence == "hutchinson" and key is None:
        raise ValueError("hutchinson divergence requires key=")

    rhs = _make_rhs(v_fn, return_dlogp, divergence, key, num_probes)
    dt = (t1 - t0) / n_steps
    per_save = n_steps // (n_save - 1)

    def step(carry, i):
        x, lp = carry
        t = t0 + i * dt

        def f(x_, lp_, t_, j):
            dx, dlp = rhs(x_, t_, i * _METHOD_NFE[method] + j)
            return dx, dlp

        if method == "euler":
            dx, dlp = f(x, lp, t, 0)
            x_new, lp_new = x + dt * dx, lp + dt * dlp
        elif method == "heun":
            k1x, k1l = f(x, lp, t, 0)
            k2x, k2l = f(x + dt * k1x, lp + dt * k1l, t + dt, 1)
            x_new = x + 0.5 * dt * (k1x + k2x)
            lp_new = lp + 0.5 * dt * (k1l + k2l)
        elif method == "rk4":
            k1x, k1l = f(x, lp, t, 0)
            k2x, k2l = f(x + 0.5 * dt * k1x, lp + 0.5 * dt * k1l, t + 0.5 * dt, 1)
            k3x, k3l = f(x + 0.5 * dt * k2x, lp + 0.5 * dt * k2l, t + 0.5 * dt, 2)
            k4x, k4l = f(x + dt * k3x, lp + dt * k3l, t + dt, 3)
            x_new = x + (dt / 6.0) * (k1x + 2 * k2x + 2 * k3x + k4x)
            lp_new = lp + (dt / 6.0) * (k1l + 2 * k2l + 2 * k3l + k4l)
        else:
            raise ValueError(f"unknown method {method!r}")
        return (x_new, lp_new), None

    def save_block(carry, block_idx):
        carry, _ = jax.lax.scan(
            step, carry, block_idx * per_save + jnp.arange(per_save)
        )
        return carry, carry

    lp0 = jnp.zeros((), dtype=x0.dtype)
    (_, _), (xs_tail, lps_tail) = jax.lax.scan(
        save_block, (x0, lp0), jnp.arange(n_save - 1)
    )
    xs = jnp.concatenate([x0[None], xs_tail], axis=0)
    lps = jnp.concatenate([lp0[None], lps_tail], axis=0)
    nfe = jnp.asarray(n_steps * _METHOD_NFE[method], dtype=jnp.int32)
    return ODESolution(xs=xs, dlogp=lps, nfe=nfe)


# ---------------------------------------------------------------------------
# Adaptive Dormand–Prince 5(4) — parity with reference dopri5 at tol 1e-5.
# ---------------------------------------------------------------------------

# Butcher tableau (Dormand & Prince 1980), same coefficients as
# torchdiffeq's dopri5 used by the reference integrators.
_DP_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DP_A = [
    jnp.array([]),
    jnp.array([1 / 5]),
    jnp.array([3 / 40, 9 / 40]),
    jnp.array([44 / 45, -56 / 15, 32 / 9]),
    jnp.array([19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]),
    jnp.array([9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]),
    jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]),
]
_DP_B5 = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_DP_B4 = jnp.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)


def sample_ode_dopri5(
    v_fn: VelocityFn,
    x0: Array,
    *,
    t0: float = 0.0,
    t1: float = 1.0,
    n_save: int = 2,
    atol: float = 1e-5,
    rtol: float = 1e-5,
    max_steps: int = 4096,
    return_dlogp: bool = True,
    divergence: str = "exact",
    key: Optional[Array] = None,
    num_probes: int = 8,
    first_dt: float = 0.01,
) -> ODESolution:
    """Adaptive RK45 with PI step control, bounded by ``max_steps`` per save
    interval so the loop stays compilable and vmappable.

    Error control is on the joint flattened (x, dlogp) state with a single
    (atol, rtol) pair — the reference instead scales div by 1e-2 and passes
    per-state tolerance lists to torchdiffeq (see module docstring).
    Reverse transport: pass t0=1.0, t1=0.0 (integrated in an internal
    forward time variable).
    """
    if return_dlogp and divergence == "hutchinson" and key is None:
        raise ValueError("hutchinson divergence requires key=")

    rhs = _make_rhs(v_fn, return_dlogp, divergence, key, num_probes)
    shape = jnp.shape(x0)
    d = int(jnp.size(x0))
    direction = 1.0 if t1 >= t0 else -1.0  # internal time tau = dir*(t - t0)

    def rhs_joint(y, tau, idx):
        x = jnp.reshape(y[:d], shape)
        dx, dlp = rhs(x, t0 + direction * tau, idx)
        return direction * jnp.concatenate([jnp.reshape(dx, (d,)), dlp[None]])

    save_ts = jnp.linspace(0.0, abs(t1 - t0), n_save)

    def err_norm(err, y, y_new):
        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_new))
        return jnp.sqrt(jnp.mean((err / scale) ** 2))

    def advance_to(carry, t_target):
        def cond(state):
            t, _, _, nfe, done = state
            return jnp.logical_and(~done, nfe < 7 * max_steps)

        def body(state):
            t, y, dt, nfe, _ = state
            dt_clipped = jnp.minimum(dt, t_target - t)
            ks = []
            for i in range(7):
                yi = y
                for j, a in enumerate(_DP_A[i]):
                    yi = yi + dt_clipped * a * ks[j]
                ks.append(rhs_joint(yi, t + _DP_C[i] * dt_clipped, nfe + i))
            k = jnp.stack(ks)  # (7, d+1)
            y5 = y + dt_clipped * jnp.einsum("s,sd->d", _DP_B5, k)
            y4 = y + dt_clipped * jnp.einsum("s,sd->d", _DP_B4, k)
            en = err_norm(y5 - y4, y, y5)

            accept = en <= 1.0
            t_new = jnp.where(accept, t + dt_clipped, t)
            y_new = jnp.where(accept, y5, y)
            factor = jnp.clip(0.9 * (en + 1e-16) ** (-0.2), 0.2, 10.0)
            dt_new = dt_clipped * factor
            done = t_new >= t_target - 1e-12
            return (t_new, y_new, dt_new, nfe + 7, done)

        t, y, dt, nfe, _ = carry
        t, y, dt, nfe, _ = jax.lax.while_loop(
            cond, body, (t, y, dt, nfe, t >= t_target - 1e-12)
        )
        return (t, y, dt, nfe, False), y

    y0 = jnp.concatenate([jnp.reshape(x0, (d,)), jnp.zeros((1,), dtype=x0.dtype)])
    carry = (jnp.asarray(0.0, dtype=x0.dtype), y0, jnp.asarray(first_dt, x0.dtype),
             jnp.asarray(0, jnp.int32), False)

    ys = [y0]
    for i in range(1, n_save):
        carry, y = advance_to(carry, save_ts[i])
        ys.append(y)
    ys = jnp.stack(ys)  # (n_save, d+1)
    xs = jnp.reshape(ys[:, :d], (n_save,) + shape)
    return ODESolution(xs=xs, dlogp=ys[:, d], nfe=carry[3])


def sample_sde(
    drift_fn: VelocityFn,
    x0: Array,
    key: Array,
    *,
    g_fn: Callable[[Array], Array] | float = 0.0,
    t0: float = 0.0,
    t1: float = 1.0,
    n_steps: int = 100,
    n_save: int = 2,
    project_zero_mean: bool = False,
) -> Array:
    """Euler–Maruyama: dX = b(X, t) dt + g(t) dW. Returns (n_save, *state).

    With g=0 this is the Euler probability-flow ODE. ``project_zero_mean``
    removes the COM of the injected noise each step (keeps molecular chains
    on the zero-COM manifold the networks were trained on).
    """
    if n_save < 2 or n_steps % (n_save - 1) != 0:
        raise ValueError("n_steps must be a positive multiple of (n_save - 1)")
    g = g_fn if callable(g_fn) else (lambda t, _g=float(g_fn): jnp.asarray(_g, x0.dtype))
    dt = (t1 - t0) / n_steps
    sqrt_dt = jnp.sqrt(jnp.abs(dt)).astype(x0.dtype)
    per_save = n_steps // (n_save - 1)

    def step(x, i):
        t = t0 + i * dt
        noise = jax.random.normal(jax.random.fold_in(key, i), jnp.shape(x), dtype=x.dtype)
        if project_zero_mean:
            noise = noise - jnp.mean(noise.reshape(-1, noise.shape[-1]), axis=0)
        x = x + dt * drift_fn(x, t) + g(t) * sqrt_dt * noise
        return x, None

    def save_block(x, block_idx):
        x, _ = jax.lax.scan(step, x, block_idx * per_save + jnp.arange(per_save))
        return x, x

    _, xs_tail = jax.lax.scan(save_block, x0, jnp.arange(n_save - 1))
    return jnp.concatenate([x0[None], xs_tail], axis=0)
