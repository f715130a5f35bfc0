"""Adaptive-solver parity: our in-repo dopri5 vs scipy's RK45 (ROADMAP #9).

torchdiffeq (the reference's solver, adw/thermo/integrators.py:6) is not in
this image, but scipy.integrate.RK45 implements the SAME Dormand-Prince
5(4) pair with a standard Hairer step controller — so it pins down both the
accuracy and the adaptive cost (nfev) our sampler should exhibit at the
reference's tolerances (atol=rtol=1e-5, 00031_settings_no_300.json:34-36).
"""

import numpy as np
import pytest
from scipy.integrate import solve_ivp

import jax
import jax.numpy as jnp

from ti_tpu.sampling.integrators import sample_ode_dopri5


def _pendulum(t, y):
    # mildly nonlinear, time-dependent: x'' = -sin(x)·(1 + 0.3 sin(2πt))
    x, v = y
    return [v, -np.sin(x) * (1.0 + 0.3 * np.sin(2 * np.pi * t))]


@pytest.mark.parametrize("tol", [1e-5, 1e-7])
def test_dopri5_matches_scipy_rk45(tol):
    y0 = np.array([1.2, -0.3])

    ref = solve_ivp(
        _pendulum, (0.0, 1.0), y0, method="RK45", atol=tol / 100, rtol=tol / 100
    )
    sp = solve_ivp(_pendulum, (0.0, 1.0), y0, method="RK45", atol=tol, rtol=tol)

    def v_fn(x, t):
        x0, v0 = x[0], x[1]
        return jnp.stack([v0, -jnp.sin(x0) * (1.0 + 0.3 * jnp.sin(2 * jnp.pi * t))])

    sol = sample_ode_dopri5(
        v_fn, jnp.asarray(y0, jnp.float32), atol=tol, rtol=tol, return_dlogp=False
    )
    ours = np.asarray(sol.xs[-1])

    # both solvers within their tolerance regime of the tight reference
    err_ours = np.max(np.abs(ours - ref.y[:, -1]))
    err_scipy = np.max(np.abs(sp.y[:, -1] - ref.y[:, -1]))
    assert err_ours < 50 * tol, (err_ours, tol)
    # and not wildly different from each other
    assert err_ours < max(10 * err_scipy, 5 * tol)

    # adaptive cost parity: same DP5(4) pair, so nfe should be within ~2x
    # (controllers differ in initial-step heuristics and safety factors)
    nfe = int(sol.nfe)
    assert nfe <= 2.0 * sp.nfev + 50, (nfe, sp.nfev)
    assert nfe >= 0.5 * sp.nfev - 50, (nfe, sp.nfev)


def test_dopri5_stiffening_field_step_adaptation():
    """Step count grows with field stiffness the same way scipy's does."""
    from scipy.integrate import solve_ivp

    counts = {}
    for k in (1.0, 30.0):
        sp = solve_ivp(
            lambda t, y, k=k: [-k * (y[0] - np.cos(8 * t))],
            (0.0, 1.0), [0.0], method="RK45", atol=1e-5, rtol=1e-5,
        )
        sol = sample_ode_dopri5(
            lambda x, t, k=k: -k * (x - jnp.cos(8 * t)),
            jnp.zeros((1,), jnp.float32), atol=1e-5, rtol=1e-5, return_dlogp=False,
        )
        counts[k] = (int(sol.nfe), sp.nfev)
    # stiffer field costs more in both solvers, by a comparable factor
    ratio_ours = counts[30.0][0] / counts[1.0][0]
    ratio_scipy = counts[30.0][1] / counts[1.0][1]
    assert ratio_ours > 1.3
    assert 0.4 < ratio_ours / ratio_scipy < 2.5


def test_dopri5_per_state_tolerances():
    """(atol, rtol) may be (x, dlogp) pairs — the per-state tolerance lists
    the reference passes to torchdiffeq (adw/thermo/integrators.py:49-55).

    Field v(x, t) = -x (1 + 0.9 sin(20 pi t)): the divergence oscillates
    fast, so a tight dlogp tolerance forces small steps while the x
    trajectory itself is easy. Loosening ONLY the dlogp tolerance must cut
    the adaptive cost without moving x — and match scipy's RK45 driven
    with the same vector atol on the joint (x, dlogp) system.
    """
    def v_fn(x, t):
        return -x * (1.0 + 0.9 * jnp.sin(20 * jnp.pi * t))

    x0 = jnp.asarray([1.5], jnp.float32)
    tight = sample_ode_dopri5(
        v_fn, x0, atol=1e-7, rtol=1e-7, return_dlogp=True
    )
    loose = sample_ode_dopri5(
        v_fn, x0, atol=(1e-7, 1e-2), rtol=(1e-7, 1e-2), return_dlogp=True
    )
    # same x trajectory endpoint; dlogp still accurate to its own tolerance
    np.testing.assert_allclose(
        np.asarray(loose.xs[-1]), np.asarray(tight.xs[-1]), atol=1e-4
    )
    np.testing.assert_allclose(
        float(loose.dlogp[-1]), float(tight.dlogp[-1]), atol=5e-2
    )
    assert int(loose.nfe) < int(tight.nfe), (int(loose.nfe), int(tight.nfe))

    # scipy joint system with the same vector atol (rtol scalar: scipy
    # requires it); our dlogp integrates -div (integrators.py rhs)
    def joint(t, y):
        c = 1.0 + 0.9 * np.sin(20 * np.pi * t)
        return [-y[0] * c, c]  # -div = +c in 1-D

    sp = solve_ivp(
        joint, (0.0, 1.0), [1.5, 0.0], method="RK45",
        atol=np.array([1e-7, 1e-2]), rtol=1e-7,
    )
    ours = sample_ode_dopri5(
        v_fn, x0, atol=(1e-7, 1e-2), rtol=1e-7, return_dlogp=True
    )
    np.testing.assert_allclose(float(ours.xs[-1][0]), sp.y[0, -1], atol=1e-4)
    np.testing.assert_allclose(float(ours.dlogp[-1]), sp.y[1, -1], atol=5e-2)
    nfe = int(ours.nfe)
    assert nfe <= 2.0 * sp.nfev + 50, (nfe, sp.nfev)


def test_dopri5_rejects_bad_tolerance_shape():
    with pytest.raises(ValueError, match="pair"):
        sample_ode_dopri5(
            lambda x, t: -x, jnp.ones((2,), jnp.float32),
            atol=(1e-5, 1e-5, 1e-5), rtol=1e-5, return_dlogp=True,
        )
