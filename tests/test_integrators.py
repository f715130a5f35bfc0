"""Integrator correctness: analytic flows, dlogp conventions, round trips.

These pin down the dlogp sign/direction conventions flagged as the #1 risk
in SURVEY.md §7 ("hard parts") before anything else depends on them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ti_tpu.sampling.integrators import sample_ode, sample_ode_dopri5, sample_sde


A = jnp.array([[0.3, 0.1], [-0.2, -0.5]])


def linear_field(x, t):
    return A @ x


def test_rk4_matches_matrix_exponential():
    x0 = jnp.array([1.0, -2.0])
    sol = sample_ode(linear_field, x0, n_steps=64, method="rk4", return_dlogp=False)
    expected = jax.scipy.linalg.expm(A) @ x0
    np.testing.assert_allclose(np.asarray(sol.xs[-1]), np.asarray(expected), rtol=1e-5)
    assert int(sol.nfe) == 64 * 4


def test_dlogp_equals_minus_trace_for_linear_flow():
    # d(dlogp)/dt = -div b = -tr(A), so dlogp(1) = -tr(A)
    x0 = jnp.array([0.7, 0.3])
    sol = sample_ode(linear_field, x0, n_steps=32, method="rk4", return_dlogp=True)
    np.testing.assert_allclose(float(sol.dlogp[-1]), -float(jnp.trace(A)), rtol=1e-5)


def test_gaussian_affine_flow_density_identity():
    # x1 = e^A x0, x0 ~ N(0, I): log p1(x1) = log p0(x0) + dlogp
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (64, 2))
    sol = jax.vmap(
        lambda x: sample_ode(linear_field, x, n_steps=64, method="rk4")
    )(x0)
    x1 = sol.xs[:, -1]
    dlogp = sol.dlogp[:, -1]

    expA = jax.scipy.linalg.expm(A)
    cov1 = expA @ expA.T
    d = 2

    def logp0(x):
        return -0.5 * jnp.sum(x**2) - 0.5 * d * jnp.log(2 * jnp.pi)

    def logp1(x):
        cinv = jnp.linalg.inv(cov1)
        _, logdet = jnp.linalg.slogdet(cov1)
        return -0.5 * x @ cinv @ x - 0.5 * (d * jnp.log(2 * jnp.pi) + logdet)

    lhs = jax.vmap(logp1)(x1)
    rhs = jax.vmap(logp0)(x0) + dlogp
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-4, atol=1e-4)


def test_round_trip_inverts_flow_and_dlogp():
    def field(x, t):
        return jnp.sin(x) + 0.3 * t * x

    x0 = jnp.array([0.4, -1.2, 2.0])
    fwd = sample_ode(field, x0, t0=0.0, t1=1.0, n_steps=256, method="rk4")
    back = sample_ode(field, fwd.xs[-1], t0=1.0, t1=0.0, n_steps=256, method="rk4")
    np.testing.assert_allclose(np.asarray(back.xs[-1]), np.asarray(x0), atol=1e-5)
    assert abs(float(fwd.dlogp[-1] + back.dlogp[-1])) < 1e-5


@pytest.mark.parametrize("method", ["euler", "heun", "rk4"])
def test_fixed_step_convergence_order(method):
    x0 = jnp.array([1.0, 0.5])
    exact = jax.scipy.linalg.expm(A) @ x0

    def err(n):
        s = sample_ode(linear_field, x0, n_steps=n, method=method, return_dlogp=False)
        return float(jnp.linalg.norm(s.xs[-1] - exact))

    # small step counts keep errors above the f32 floor
    e1, e2 = err(2), err(4)
    order = {"euler": 1, "heun": 2, "rk4": 4}[method]
    assert e2 < e1 / (2 ** (order - 0.5))


def test_dopri5_matches_fixed_step_high_accuracy():
    def field(x, t):
        return jnp.tanh(x) * (1.0 + t)

    x0 = jnp.array([0.2, -0.7, 1.5])
    ref = sample_ode(field, x0, n_steps=2048, method="rk4")
    ada = sample_ode_dopri5(field, x0, atol=1e-7, rtol=1e-7)
    # f32 accumulation floor ~1e-5
    np.testing.assert_allclose(np.asarray(ada.xs[-1]), np.asarray(ref.xs[-1]), atol=2e-5)
    np.testing.assert_allclose(float(ada.dlogp[-1]), float(ref.dlogp[-1]), atol=2e-5)
    assert int(ada.nfe) > 0


def test_dopri5_reverse_round_trip():
    def field(x, t):
        return jnp.cos(3 * x) + t

    x0 = jnp.array([0.1, 0.9])
    fwd = sample_ode_dopri5(field, x0, atol=1e-8, rtol=1e-8)
    back = sample_ode_dopri5(field, fwd.xs[-1], t0=1.0, t1=0.0, atol=1e-8, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(back.xs[-1]), np.asarray(x0), atol=1e-5)
    assert abs(float(fwd.dlogp[-1] + back.dlogp[-1])) < 1e-5


def test_dopri5_save_points_monotone():
    sol = sample_ode_dopri5(linear_field, jnp.array([1.0, 1.0]), n_save=5)
    assert sol.xs.shape == (5, 2)
    # first saved state is x0
    np.testing.assert_allclose(np.asarray(sol.xs[0]), [1.0, 1.0])


def test_hutchinson_dlogp_close_to_exact():
    key = jax.random.PRNGKey(3)
    x0 = jnp.array([0.5, -0.5, 1.0, 2.0])
    exact = sample_ode(linear_field_4d, x0, n_steps=64, method="rk4", divergence="exact")
    hutch = sample_ode(
        linear_field_4d,
        x0,
        n_steps=64,
        method="rk4",
        divergence="hutchinson",
        key=key,
        num_probes=128,
    )
    # linear field: Rademacher Hutchinson has variance only from off-diagonals
    assert abs(float(exact.dlogp[-1]) - float(hutch.dlogp[-1])) < 0.05
    np.testing.assert_allclose(np.asarray(exact.xs[-1]), np.asarray(hutch.xs[-1]), rtol=1e-6)


A4 = jnp.array(
    [[0.3, 0.05, 0.0, 0.0], [0.0, -0.2, 0.1, 0.0], [0.0, 0.0, 0.1, 0.02], [0.01, 0.0, 0.0, -0.4]]
)


def linear_field_4d(x, t):
    return A4 @ x


def test_sde_zero_noise_is_euler_ode():
    x0 = jnp.array([1.0, -1.0])
    key = jax.random.PRNGKey(0)
    xs = sample_sde(linear_field, x0, key, g_fn=0.0, n_steps=128)
    euler = sample_ode(linear_field, x0, n_steps=128, method="euler", return_dlogp=False)
    np.testing.assert_allclose(np.asarray(xs[-1]), np.asarray(euler.xs[-1]), rtol=1e-5)


def test_sde_ou_stationary_variance():
    # dX = -X dt + sqrt(2) dW has stationary N(0, 1)
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (4096,))

    def drift(x, t):
        return -x

    xs = jax.vmap(
        lambda x, k: sample_sde(drift, x, k, g_fn=jnp.sqrt(2.0), t0=0.0, t1=4.0, n_steps=512)
    )(x0[:, None], jax.random.split(jax.random.fold_in(key, 7), 4096))
    final = xs[:, -1, 0]
    assert abs(float(jnp.mean(final))) < 0.1
    assert abs(float(jnp.var(final)) - 1.0) < 0.12


def test_vmapped_chains_shapes():
    x0 = jax.random.normal(jax.random.PRNGKey(2), (10, 3))
    sol = jax.vmap(lambda x: sample_ode(lambda y, t: -y, x, n_steps=8, n_save=5))(x0)
    assert sol.xs.shape == (10, 5, 3)
    assert sol.dlogp.shape == (10, 5)


def test_quad_dlogp_exact_for_linear_flow():
    from ti_tpu.sampling.integrators import sample_ode_quad_dlogp

    x0 = jnp.array([0.7, 0.3])
    sol = sample_ode_quad_dlogp(linear_field, x0, n_steps=40, div_points=5)
    # constant divergence: Simpson is exact
    np.testing.assert_allclose(float(sol.dlogp[-1]), -float(jnp.trace(A)), rtol=1e-5)
    full = sample_ode(linear_field, x0, n_steps=40, method="rk4")
    np.testing.assert_allclose(np.asarray(sol.xs[-1]), np.asarray(full.xs[-1]), rtol=1e-6)


def test_quad_dlogp_matches_full_on_nonlinear():
    from ti_tpu.sampling.integrators import sample_ode_quad_dlogp

    def field(x, t):
        return jnp.sin(x) * (1.0 + 0.5 * t) + 0.1 * x**2

    x0 = jnp.array([0.4, -0.8, 1.1])
    full = sample_ode(field, x0, n_steps=240, method="rk4")
    quad = sample_ode_quad_dlogp(field, x0, n_steps=240, div_points=25)
    np.testing.assert_allclose(float(quad.dlogp[-1]), float(full.dlogp[-1]), atol=2e-4)


def test_quad_dlogp_multiple_save_points():
    from ti_tpu.sampling.integrators import sample_ode_quad_dlogp

    def field(x, t):
        return -x * (1.0 + t)

    x0 = jnp.array([1.0, 2.0])
    quad = sample_ode_quad_dlogp(field, x0, n_steps=48, div_points=25, n_save=4)
    full = sample_ode(field, x0, n_steps=48, method="rk4", n_save=4)
    assert quad.xs.shape == (4, 2)
    np.testing.assert_allclose(np.asarray(quad.dlogp), np.asarray(full.dlogp), atol=1e-4)


def test_gauss_dlogp_exact_for_linear_flow():
    from ti_tpu.sampling.integrators import sample_ode_gauss_dlogp

    x0 = jnp.array([0.7, 0.3])
    sol = sample_ode_gauss_dlogp(linear_field, x0, n_steps=40, gl_points=4)
    np.testing.assert_allclose(float(sol.dlogp[-1]), -float(jnp.trace(A)), rtol=1e-5)
    full = sample_ode(linear_field, x0, n_steps=40, method="rk4")
    np.testing.assert_allclose(np.asarray(sol.xs[-1]), np.asarray(full.xs[-1]), rtol=1e-5)


def test_gauss_dlogp_matches_full_on_nonlinear():
    """GL-8 matches the fully coupled dlogp at Simpson-25 accuracy with
    ~3x fewer divergence nodes."""
    from ti_tpu.sampling.integrators import sample_ode_gauss_dlogp

    def field(x, t):
        return jnp.sin(x) * (1.0 + 0.5 * t) + 0.1 * x**2

    x0 = jnp.array([0.4, -0.8, 1.1])
    full = sample_ode(field, x0, n_steps=240, method="rk4")
    g8 = sample_ode_gauss_dlogp(field, x0, n_steps=240, gl_points=8)
    np.testing.assert_allclose(float(g8.dlogp[-1]), float(full.dlogp[-1]), atol=2e-4)


def test_gauss_dlogp_multiple_save_points():
    from ti_tpu.sampling.integrators import sample_ode_gauss_dlogp

    def field(x, t):
        return -x * (1.0 + t)

    x0 = jnp.array([1.0, 2.0])
    # analytic: dlogp(t) = int_0^t (1+s) ds * dim = (t + t^2/2) * 2
    g = sample_ode_gauss_dlogp(field, x0, n_steps=48, gl_points=6, n_save=4)
    assert g.xs.shape == (4, 2)
    ts = np.linspace(0.0, 1.0, 4)
    np.testing.assert_allclose(np.asarray(g.dlogp), 2 * (ts + ts**2 / 2), atol=1e-5)
    full = sample_ode(field, x0, n_steps=48, method="rk4", n_save=4)
    np.testing.assert_allclose(np.asarray(g.xs), np.asarray(full.xs), rtol=1e-5, atol=1e-7)


def test_gauss_dlogp_reverse_transport():
    from ti_tpu.sampling.integrators import sample_ode_gauss_dlogp

    x0 = jnp.array([0.5, -0.2])
    fwd = sample_ode_gauss_dlogp(linear_field, x0, n_steps=40, gl_points=4)
    back = sample_ode_gauss_dlogp(
        linear_field, fwd.xs[-1], t0=1.0, t1=0.0, n_steps=40, gl_points=4
    )
    np.testing.assert_allclose(np.asarray(back.xs[-1]), np.asarray(x0), atol=1e-6)
    np.testing.assert_allclose(
        float(back.dlogp[-1]), -float(fwd.dlogp[-1]), atol=1e-6
    )


def test_node_batch_matches_sequential():
    """node_batch (vmapped quadrature-node groups) reproduces the
    sequential lax.map evaluation exactly — same per-node probe keys, same
    quadrature sums — on both integrator-level quad paths and through the
    segmented driver."""
    from ti_tpu.sampling.drivers import make_ode_sampler
    from ti_tpu.sampling.integrators import (
        sample_ode_gauss_dlogp,
        sample_ode_quad_dlogp,
    )

    def field(x, t):
        return jnp.sin(x) * (1.0 + 0.5 * t) + 0.1 * x**2

    x0 = jnp.array([0.4, -0.8, 1.1])
    key = jax.random.PRNGKey(3)
    for div, kw in [("exact", {}), ("hutchinson", {"key": key, "num_probes": 4})]:
        seq = sample_ode_gauss_dlogp(
            field, x0, n_steps=32, gl_points=8, divergence=div, **kw
        )
        bat = sample_ode_gauss_dlogp(
            field, x0, n_steps=32, gl_points=8, divergence=div,
            node_batch=4, **kw
        )
        np.testing.assert_array_equal(np.asarray(seq.xs), np.asarray(bat.xs))
        np.testing.assert_allclose(
            np.asarray(seq.dlogp), np.asarray(bat.dlogp), rtol=1e-6
        )
        seq_s = sample_ode_quad_dlogp(
            field, x0, n_steps=32, div_points=5, divergence=div, **kw
        )
        bat_s = sample_ode_quad_dlogp(
            field, x0, n_steps=32, div_points=5, divergence=div,
            node_batch=5, **kw
        )
        np.testing.assert_allclose(
            np.asarray(seq_s.dlogp), np.asarray(bat_s.dlogp), rtol=1e-6
        )

    # segmented driver path (steps_per_dispatch -> div_all's lax.map)
    def v_fn_of(cond):
        return field

    x0s = jnp.stack([x0, 0.5 * x0])
    conds = jnp.zeros((2, 1))
    kw = dict(solver="rk4", n_steps=16, n_save=2, return_dlogp=True,
              dlogp_quad_points=8, dlogp_quad="gauss", steps_per_dispatch=8,
              divergence="hutchinson", num_probes=4)
    seq = make_ode_sampler(v_fn_of, **kw)(x0s, conds, key)
    bat = make_ode_sampler(v_fn_of, node_batch=8, **kw)(x0s, conds, key)
    np.testing.assert_array_equal(np.asarray(seq.xs), np.asarray(bat.xs))
    np.testing.assert_allclose(
        np.asarray(seq.dlogp), np.asarray(bat.dlogp), rtol=1e-6
    )


def test_quad_dlogp_validation():
    from ti_tpu.sampling.integrators import sample_ode_quad_dlogp

    x0 = jnp.ones(2)
    with pytest.raises(ValueError):
        sample_ode_quad_dlogp(linear_field, x0, n_steps=40, div_points=4)
    with pytest.raises(ValueError):
        sample_ode_quad_dlogp(linear_field, x0, n_steps=41, div_points=5)
    with pytest.raises(ValueError):
        sample_ode_quad_dlogp(linear_field, x0, n_steps=40, div_points=5, n_save=5)


def test_num_probes_threads_through_driver_quad_path():
    """make_ode_sampler(num_probes=...) reaches the quadrature divergence
    nodes: a large probe count reproduces the exact-divergence dlogp on a
    nonlinear field, a single probe scatters measurably more."""
    from ti_tpu.sampling.drivers import make_ode_sampler

    def v_fn_of(cond):
        def v(x, t):
            return jnp.tanh(A4 @ x) * (1.0 + 0.5 * t)

        return v

    x0s = jnp.array([[0.5, -0.5, 1.0, 2.0], [0.2, 0.1, -0.3, 0.4]])
    conds = jnp.zeros((2, 1))
    kw = dict(solver="rk4", n_steps=8, n_save=2, return_dlogp=True,
              dlogp_quad_points=4, dlogp_quad="gauss")
    exact = make_ode_sampler(v_fn_of, divergence="exact", **kw)(
        x0s, conds, jax.random.PRNGKey(0)
    )

    def hutch_err(probes, seed):
        sol = make_ode_sampler(
            v_fn_of, divergence="hutchinson", num_probes=probes, **kw
        )(x0s, conds, jax.random.PRNGKey(seed))
        return float(jnp.max(jnp.abs(sol.dlogp[:, -1] - exact.dlogp[:, -1])))

    big = max(hutch_err(512, s) for s in range(3))
    small = max(hutch_err(1, s) for s in range(3))
    # 512 probes cut the Rademacher std ~22x vs 1 probe; a generous factor
    # of 4 proves the knob reaches the quadrature nodes without flaking
    assert big < 0.25 * small


def test_probe_crn_shares_noise_across_chains():
    """probe_crn=True gives identical chains identical stochastic-divergence
    draws (common random numbers), so their dlogps agree exactly; with
    independent draws they differ. CRN semantics: the common noise
    component cancels in self-normalized importance weights (ESS) but NOT
    in absolute dF — see BASELINE.md CRN rows."""
    import numpy as np

    from ti_tpu.sampling.drivers import make_ode_sampler

    A = jnp.asarray(np.random.RandomState(0).randn(3, 3).astype(np.float32)) * 0.3
    f_of = lambda c: (lambda x, t: c * (A @ x))

    def dlogps(crn):
        s = make_ode_sampler(
            f_of, solver="rk4", n_steps=4, return_dlogp=True,
            divergence="hutchinson", num_probes=2,
            dlogp_quad_points=4, dlogp_quad="gauss", probe_crn=crn,
        )
        sol = s(jnp.ones((3, 3)), jnp.ones(3), jax.random.PRNGKey(0))
        return np.asarray(sol.dlogp[:, -1])

    ind, crn = dlogps(False), dlogps(True)
    assert np.allclose(crn, crn[0])
    assert not np.allclose(ind, ind[0])

    # the segmented stage-coupled path (steps_per_dispatch, no quadrature)
    # must honor probe_crn too — it used to split independent keys per chain
    def dlogps_seg(crn):
        s = make_ode_sampler(
            f_of, solver="rk4", n_steps=4, return_dlogp=True,
            divergence="hutchinson", num_probes=2, steps_per_dispatch=2,
            probe_crn=crn,
        )
        sol = s(jnp.ones((3, 3)), jnp.ones(3), jax.random.PRNGKey(0))
        return np.asarray(sol.dlogp[:, -1])

    ind_seg, crn_seg = dlogps_seg(False), dlogps_seg(True)
    assert np.allclose(crn_seg, crn_seg[0])
    assert not np.allclose(ind_seg, ind_seg[0])
