"""Interpolant identities (SURVEY.md §4 oracles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ti_tpu import interpolants as ip


@pytest.mark.parametrize("gamma", ["brownian", "sin2", "sig_sum"])
def test_gamma_endpoints_vanish(gamma):
    it = ip.linear(a=0.9, gamma=gamma)
    # gamma(0) = gamma(1) = 0 (up to f32 rounding for sig_sum)
    assert float(it.gamma(jnp.array(0.0))) == pytest.approx(0.0, abs=1e-5)
    assert float(it.gamma(jnp.array(1.0))) == pytest.approx(0.0, abs=1e-5)


@pytest.mark.parametrize("gamma", ["brownian", "sin2", "sig_sum"])
def test_gamma_dot_is_derivative(gamma):
    it = ip.linear(a=0.9, gamma=gamma)
    ts = jnp.linspace(0.05, 0.95, 19)
    num = jax.vmap(jax.grad(lambda t: it.gamma(t)))(ts)
    ana = it.gamma_dot(ts)
    np.testing.assert_allclose(np.asarray(num), np.asarray(ana), rtol=1e-4, atol=1e-5)
    # gg_dot = gamma * gamma_dot
    np.testing.assert_allclose(
        np.asarray(it.gg_dot(ts)), np.asarray(it.gamma(ts) * ana), rtol=1e-4, atol=1e-5
    )


def test_It_endpoints():
    it = ip.linear(a=1.0, gamma="brownian")
    x0 = jnp.array([1.0, -2.0])
    x1 = jnp.array([3.0, 5.0])
    np.testing.assert_allclose(np.asarray(it.It(jnp.array(0.0), x0, x1)), np.asarray(x0))
    np.testing.assert_allclose(np.asarray(it.It(jnp.array(1.0), x0, x1)), np.asarray(x1))
    np.testing.assert_allclose(
        np.asarray(it.dtIt(jnp.array(0.3), x0, x1)), np.asarray(x1 - x0)
    )


def test_antithetic_symmetry_two_sided():
    it = ip.linear(a=1.0, gamma="sin2")
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (16, 3))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (16, 3))
    t = jnp.full((16, 1), 0.37)
    plus, minus, z = it.antithetic_xts(jax.random.fold_in(key, 2), t, x0, x1)
    # (plus + minus) / 2 == It, (plus - minus) / 2 == gamma * z
    np.testing.assert_allclose(
        np.asarray((plus + minus) / 2), np.asarray(it.It(t, x0, x1)), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray((plus - minus) / 2),
        np.asarray(it.gamma(jnp.array(0.37)) * z),
        rtol=1e-5,
        atol=1e-6,
    )


def test_one_sided_uses_x0_as_noise():
    it = ip.one_sided_linear()
    assert it.one_sided
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (8, 3))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (8, 3))
    t = jnp.full((8, 1), 0.25)
    plus, minus, z = it.antithetic_xts(jax.random.fold_in(key, 2), t, x0, x1)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x0))
    np.testing.assert_allclose(
        np.asarray(plus), np.asarray(0.25 * x1 + 0.75 * x0), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(minus), np.asarray(0.25 * x1 - 0.75 * x0), rtol=1e-6
    )


def test_make_interpolant_dispatch():
    assert ip.make_interpolant("linear", gamma="sin2").name == "linear/sin2"
    assert ip.make_interpolant("one_sided").one_sided
    with pytest.raises(ValueError):
        ip.make_interpolant("nope")
    with pytest.raises(ValueError):
        ip.linear(gamma="nope")
