"""Segmented (bounded-dispatch) samplers match single-dispatch results."""

import jax
import jax.numpy as jnp
import numpy as np

from ti_tpu.sampling.drivers import make_ode_sampler


def _v_fn_of(cond):
    def v(x, t):
        return -cond * x + 0.3 * jnp.sin(3.0 * x) * t

    return v


def test_segmented_fixed_step_matches_single_dispatch():
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (6, 4))
    conds = jnp.linspace(0.5, 1.5, 6)

    single = make_ode_sampler(
        _v_fn_of, solver="rk4", n_steps=32, n_save=5, return_dlogp=True
    )
    seg = make_ode_sampler(
        _v_fn_of, solver="rk4", n_steps=32, n_save=5, return_dlogp=True,
        steps_per_dispatch=4,
    )
    a = single(x0, conds, key)
    b = seg(x0, conds, key)
    assert b.xs.shape == a.xs.shape == (6, 5, 4)
    np.testing.assert_allclose(np.asarray(b.xs), np.asarray(a.xs), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.dlogp), np.asarray(a.dlogp), rtol=1e-4, atol=1e-5)
    assert int(b.nfe) == int(a.nfe[0] if a.nfe.ndim else a.nfe)


def test_segmented_dopri5_matches_single_dispatch():
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (4, 3))
    conds = jnp.linspace(0.5, 1.0, 4)

    single = make_ode_sampler(
        _v_fn_of, solver="dopri5", n_save=3, atol=1e-6, rtol=1e-6, return_dlogp=True
    )
    seg = make_ode_sampler(
        _v_fn_of, solver="dopri5", n_save=3, atol=1e-6, rtol=1e-6,
        return_dlogp=True, steps_per_dispatch=8,
    )
    a = single(x0, conds, key)
    b = seg(x0, conds, key)
    np.testing.assert_allclose(np.asarray(b.xs), np.asarray(a.xs), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.dlogp), np.asarray(a.dlogp), rtol=1e-3, atol=1e-4)


def test_segmented_uneven_dispatch_size():
    # steps_per_dispatch not dividing per_save: rounds to nearest divisor
    key = jax.random.PRNGKey(2)
    x0 = jax.random.normal(key, (3, 2))
    conds = jnp.ones((3,))
    single = make_ode_sampler(_v_fn_of, solver="heun", n_steps=30, n_save=2)
    seg = make_ode_sampler(
        _v_fn_of, solver="heun", n_steps=30, n_save=2, steps_per_dispatch=7
    )
    a = single(x0, conds, key)
    b = seg(x0, conds, key)
    np.testing.assert_allclose(np.asarray(b.xs), np.asarray(a.xs), rtol=1e-5, atol=1e-6)


def test_quad_dlogp_sampler_matches_full():
    key = jax.random.PRNGKey(3)
    x0 = jax.random.normal(key, (4, 3))
    conds = jnp.linspace(0.5, 1.2, 4)

    full = make_ode_sampler(_v_fn_of, solver="rk4", n_steps=48, n_save=2)
    quad_single = make_ode_sampler(
        _v_fn_of, solver="rk4", n_steps=48, n_save=2, dlogp_quad_points=13
    )
    quad_seg = make_ode_sampler(
        _v_fn_of, solver="rk4", n_steps=48, n_save=2, dlogp_quad_points=13,
        steps_per_dispatch=8,
    )
    a = full(x0, conds, key)
    b = quad_single(x0, conds, key)
    c = quad_seg(x0, conds, key)
    np.testing.assert_allclose(np.asarray(b.xs), np.asarray(a.xs), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.dlogp), np.asarray(a.dlogp), atol=1e-4)
    np.testing.assert_allclose(np.asarray(c.xs), np.asarray(b.xs), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c.dlogp), np.asarray(b.dlogp), atol=1e-5)


def test_gauss_dlogp_sampler_matches_full():
    key = jax.random.PRNGKey(4)
    x0 = jax.random.normal(key, (4, 3))
    conds = jnp.linspace(0.5, 1.2, 4)

    full = make_ode_sampler(_v_fn_of, solver="rk4", n_steps=48, n_save=3)
    g_single = make_ode_sampler(
        _v_fn_of, solver="rk4", n_steps=48, n_save=3, dlogp_quad_points=6,
        dlogp_quad="gauss",
    )
    g_seg = make_ode_sampler(
        _v_fn_of, solver="rk4", n_steps=48, n_save=3, dlogp_quad_points=6,
        dlogp_quad="gauss", steps_per_dispatch=8,
    )
    a = full(x0, conds, key)
    b = g_single(x0, conds, key)
    c = g_seg(x0, conds, key)
    np.testing.assert_allclose(np.asarray(b.xs), np.asarray(a.xs), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.dlogp), np.asarray(a.dlogp), atol=1e-4)
    np.testing.assert_allclose(np.asarray(c.xs), np.asarray(b.xs), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c.dlogp), np.asarray(b.dlogp), atol=1e-4)
