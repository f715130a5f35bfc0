"""ADW end-to-end physics validation (SURVEY.md §7 step-1 exit test).

Train the velocity field on exact Boltzmann samples at beta0=1.0 and
beta1=1.25, transport the test split with dlogp, and check the physics
against quadrature oracles:

- transported marginal matches the beta1 Boltzmann density;
- TFEP free-energy difference matches -(logZ1 - logZ0) by quadrature;
- round-trip transport returns to the start with dlogp cancelling.

Marked slow: ~2-4 minutes on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ti_tpu import interpolants
from ti_tpu.analysis.potentials import AsymmetricDoubleWell, BoltzmannDensity1D, delta_f_quadrature
from ti_tpu.analysis.weights import calc_ess
from ti_tpu.config import ADWConfig
from ti_tpu.data.adw import ADWDataset, make_synthetic_adw_csv
from ti_tpu.sampling.integrators import sample_ode
from ti_tpu.train.adw import train_adw

BETA0, BETA1 = 1.0, 1.25
POT = AsymmetricDoubleWell()


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("adw_physics")
    csv = make_synthetic_adw_csv(
        str(tmp / "samples.csv"), betas=[BETA0, BETA1], n_samples=40_000
    )
    cfg = ADWConfig(
        n_samples=40_000, hidden_size=64, num_layers=3, epochs=50, lr=1e-3, wd=0.0,
        batch_size=1024, a=0.9, traj_path=str(tmp),
        model_save_path=str(tmp / "models"), data_save_path=str(tmp / "out"),
    )
    result = train_adw(cfg)

    # fresh exact test samples at beta0
    x0 = BoltzmannDensity1D(BETA0, POT).sample(123, 4000).astype(np.float32)
    return cfg, result, x0


def _v_fn(result):
    model, params = result["model"], result["params"]

    def v(x, t):
        xt = x[None, :]
        tt = jnp.full((1, 1), t, dtype=x.dtype)
        b0 = jnp.full((1, 1), BETA0, dtype=x.dtype)
        b1 = jnp.full((1, 1), BETA1, dtype=x.dtype)
        return model.apply(params, xt, tt, b0, b1)[0]

    return v


@pytest.fixture(scope="module")
def transported(trained):
    cfg, result, x0 = trained
    v = _v_fn(result)

    @jax.jit
    def run(x0s):
        return jax.vmap(
            lambda x: sample_ode(v, x, n_steps=128, method="rk4", divergence="exact")
        )(x0s)

    sol = run(jnp.asarray(x0)[:, None])
    return x0, np.asarray(sol.xs[:, -1, 0]), np.asarray(sol.dlogp[:, -1])


@pytest.mark.slow
def test_marginal_matches_target_boltzmann(transported):
    x0, x1, dlogp = transported
    dens1 = BoltzmannDensity1D(BETA1, POT)
    # compare CDFs on a grid (Kolmogorov-Smirnov style)
    grid = np.linspace(-2.0, 2.0, 201)
    xs = np.linspace(-4, 4, 4000)
    pdf = dens1.pdf(xs)
    cdf_target = np.cumsum(pdf)
    cdf_target /= cdf_target[-1]
    cdf_t = np.interp(grid, xs, cdf_target)
    cdf_emp = np.searchsorted(np.sort(x1), grid) / len(x1)
    ks = np.max(np.abs(cdf_emp - cdf_t))
    assert ks < 0.06, f"KS distance {ks:.3f} too large"


@pytest.mark.slow
def test_tfep_delta_f_matches_quadrature(transported):
    x0, x1, dlogp = transported
    e0 = np.asarray(POT(x0))
    e1 = np.asarray(POT(x1))
    log_w = BETA0 * e0 - BETA1 * e1 - dlogp  # adw/analysis/reweight_gedmd.py:33
    mx = log_w.max()
    dF_est = -(mx + np.log(np.mean(np.exp(log_w - mx))))
    dF_exact = delta_f_quadrature(BETA0, BETA1, POT)
    assert dF_est == pytest.approx(dF_exact, abs=0.05), (dF_est, dF_exact)
    # transport should have decent ESS
    ess = calc_ess(np.exp(log_w - mx))
    assert ess > 0.2 * len(x0)


@pytest.mark.slow
def test_round_trip_transport(trained, transported):
    cfg, result, _ = trained
    x0, x1, dlogp = transported
    v = _v_fn(result)

    @jax.jit
    def back(x1s):
        return jax.vmap(
            lambda x: sample_ode(v, x, t0=1.0, t1=0.0, n_steps=128, method="rk4")
        )(x1s)

    sol = back(jnp.asarray(x1[:500])[:, None])
    x0_rec = np.asarray(sol.xs[:, -1, 0])
    dlogp_back = np.asarray(sol.dlogp[:, -1])
    np.testing.assert_allclose(x0_rec, x0[:500], atol=1e-3)
    np.testing.assert_allclose(dlogp[:500] + dlogp_back, 0.0, atol=1e-3)


@pytest.mark.slow
def test_quad_dlogp_matches_full_on_trained_model(trained, transported):
    """The quadrature-decoupled dlogp (the fast production path) must agree
    with the stage-coupled dlogp on a REAL trained field."""
    from ti_tpu.sampling.integrators import sample_ode_quad_dlogp

    cfg, result, x0 = trained
    _, _, dlogp_full = transported
    v = _v_fn(result)

    errs = {}
    for pts in (17, 33):
        sol = jax.jit(lambda xs, p=pts: jax.vmap(
            lambda x: sample_ode_quad_dlogp(v, x, n_steps=128, div_points=p, method="rk4")
        )(xs))(jnp.asarray(x0[:1000])[:, None])
        errs[pts] = np.abs(np.asarray(sol.dlogp[:, -1]) - dlogp_full[:1000])

    # converges with node count; at 33 nodes the log-weight error is
    # negligible for TFEP (<1e-2 at p99 ~ <1% weight perturbation)
    assert np.percentile(errs[33], 99) <= np.percentile(errs[17], 99) + 1e-5
    assert np.percentile(errs[33], 99) < 5e-3, np.percentile(errs[33], 99)
    assert float(np.max(errs[33])) < 5e-2


@pytest.mark.slow
def test_gauss_dlogp_matches_full_on_trained_model(trained, transported):
    """Gauss-Legendre dlogp at 10 nodes must match the stage-coupled dlogp
    as well as Simpson-21+ on a REAL trained field (it replaces Simpson as
    the production default at ~2x fewer divergence passes; measured sweep:
    GL-10/12/16 and Simpson-21/33 all plateau at p99 ~6-8e-3 against a
    256-step coupled reference — the floor is trajectory discretization,
    not quadrature)."""
    from ti_tpu.sampling.integrators import sample_ode_gauss_dlogp

    cfg, result, x0 = trained
    _, _, dlogp_full = transported
    v = _v_fn(result)

    errs = {}
    for pts in (6, 10):
        sol = jax.jit(lambda xs, p=pts: jax.vmap(
            lambda x: sample_ode_gauss_dlogp(v, x, n_steps=128, gl_points=p, method="rk4")
        )(xs))(jnp.asarray(x0[:1000])[:, None])
        errs[pts] = np.abs(np.asarray(sol.dlogp[:, -1]) - dlogp_full[:1000])

    # converges with node count; at 10 nodes the log-weight error is at the
    # same trajectory-limited floor as Simpson-21/33 (cf. test above)
    assert np.percentile(errs[10], 99) <= np.percentile(errs[6], 99) + 1e-5
    assert np.percentile(errs[10], 99) < 1e-2, np.percentile(errs[10], 99)
    assert float(np.max(errs[10])) < 5e-2
