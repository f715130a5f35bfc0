"""Analysis-layer tests: ESS/weights/free energies vs closed forms."""

import numpy as np
import pytest

from ti_tpu.analysis.free_energy import (
    bootstrap_ci,
    calc_bg_dF,
    calc_phis_bg,
    calc_phis_bg_tfep,
    calc_phis_tfep,
    calc_tfep_dF,
)
from ti_tpu.analysis.potentials import AsymmetricDoubleWell, BoltzmannDensity1D, delta_f_quadrature
from ti_tpu.analysis.weights import (
    calc_ess,
    calc_importance_weights,
    calc_log_mvnormal_pzs,
    calc_ti_weights,
    filter_iqr,
    resample_with_weights,
    weights_filter_iqr,
)


def test_adw_potential_values():
    pot = AsymmetricDoubleWell(a=4.0, b=0.5)
    assert float(pot(np.array(1.0))) == pytest.approx(0.5)
    assert float(pot(np.array(-1.0))) == pytest.approx(-0.5)
    # grad matches finite differences
    x = 0.3
    eps = 1e-6
    fd = (pot(np.array(x + eps)) - pot(np.array(x - eps))) / (2 * eps)
    assert float(pot.grad(np.array(x))) == pytest.approx(float(fd), rel=1e-4)


def test_boltzmann_density_normalized_and_sampling():
    dens = BoltzmannDensity1D(beta=1.0)
    x = np.linspace(-3, 3, 2000)
    mass = np.trapezoid(dens.pdf(x), x)
    assert mass == pytest.approx(1.0, abs=1e-3)
    s = dens.sample(0, 50_000)
    # sample mean matches quadrature mean
    mean_q = np.trapezoid(x * dens.pdf(x), x)
    assert s.mean() == pytest.approx(mean_q, abs=0.02)


def test_delta_f_quadrature_sign():
    # higher beta -> lower entropy contribution; just check consistency
    df = delta_f_quadrature(1.0, 1.25)
    df_rev = delta_f_quadrature(1.25, 1.0)
    assert df == pytest.approx(-df_rev, rel=1e-10)


def test_ess_limits():
    assert calc_ess(np.ones(100)) == pytest.approx(100.0)
    w = np.zeros(100)
    w[0] = 1.0
    assert calc_ess(w + 1e-12) == pytest.approx(1.0, rel=1e-3)


def test_ti_weights_and_tfep_exact_gaussian():
    """Exact oracle: transport N(0,1) -> N(0,1) with identity map but
    'target' energies from N(0, s); TFEP recovers dF = -log(Z1/Z0)."""
    rng = np.random.default_rng(0)
    n = 200_000
    x = rng.standard_normal(n)
    # reduced energies: E0 = x^2/2 (beta absorbed), E1 = x^2/(2 s^2)
    s = 0.8
    E0 = x**2 / 2
    E1 = x**2 / (2 * s**2)
    neg_dlogp = np.zeros(n)  # identity transport
    phis, keep = calc_phis_tfep(E0, E1, neg_dlogp)
    dF = calc_tfep_dF(phis)
    # dF = -log(Z1/Z0) with Z = sqrt(2 pi) s => dF = -log(s)
    assert dF == pytest.approx(-np.log(s), abs=0.01)
    w = calc_ti_weights(E0, E1, neg_dlogp)
    assert calc_ess(w) > 0.5 * n  # mild mismatch, high ESS


def test_log_mvnormal_matches_scipy():
    from scipy.stats import multivariate_normal

    rng = np.random.default_rng(1)
    z = rng.standard_normal((10, 4, 3))
    ours = calc_log_mvnormal_pzs(z)
    ref = multivariate_normal(mean=np.zeros(12), cov=np.eye(12)).logpdf(z.reshape(10, -1))
    np.testing.assert_allclose(ours, ref, rtol=1e-9)


def test_importance_weights_shapes():
    rng = np.random.default_rng(2)
    z = rng.standard_normal((50, 4, 3))
    E1 = rng.uniform(0, 1, 50)
    w = calc_importance_weights(z, E1, np.zeros(50), np.zeros(50))
    assert w.shape == (50,) and np.all(w > 0)


def test_iqr_filters():
    x = np.concatenate([np.random.default_rng(3).normal(0, 1, 1000), [1e6]])
    keep = filter_iqr(x, k=10)
    assert not keep[-1] and keep[:-1].mean() > 0.99
    keep2 = weights_filter_iqr(x)
    assert not keep2[-1]
    assert filter_iqr(x, k=None).all()


def test_bg_estimators():
    rng = np.random.default_rng(4)
    Es = rng.normal(5.0, 0.1, 1000)
    nd = rng.normal(-2.0, 0.1, 1000)
    phis = calc_phis_bg(Es, nd)
    assert calc_bg_dF(phis) == pytest.approx(3.0, abs=0.05)
    phis2 = calc_phis_bg_tfep(Es, nd, Es + 1.0, nd)
    assert calc_tfep_dF(phis2) == pytest.approx(1.0, abs=0.05)


def test_bootstrap_ci_covers():
    rng = np.random.default_rng(5)
    data = rng.normal(3.0, 1.0, 2000)
    est, (lo, hi) = bootstrap_ci(lambda x: float(np.mean(x)), (data,), n_bootstrap=200, seed=1)
    assert lo < 3.0 < hi
    assert est == pytest.approx(3.0, abs=0.1)


def test_resample_with_weights_bias():
    x = np.array([0.0, 1.0])
    out = resample_with_weights(x, np.array([0.01, 0.99]), n_samples=5000, seed=0)
    assert out.mean() > 0.95


@pytest.mark.slow
def test_reweighted_generator_spectrum_harmonic_oracle():
    """End-to-end reweighting -> gEDMD against an ANALYTIC answer: for
    V = x^2/2 the Langevin generator spectrum is -n (beta-independent), so
    both reweighting routes must recover it at the TARGET beta.

    TI route: exact affine transport x1 = s x0 (s = sqrt(beta0/beta1))
    between the two Boltzmann Gaussians with its exact dlogp — the TI
    weights must come out CONSTANT (the transport is perfect) and the
    resampled spectrum analytic. Direct route: Boltzmann reweighting of the
    beta0 samples. This validates the weight formulas' sign conventions
    jointly with the spectral estimator (the reference procedure,
    adw/analysis/reweight_gedmd.py, on a tractable potential)."""
    import dataclasses

    from ti_tpu.analysis.reweight import calculate_weights, direct_weights
    from ti_tpu.analysis.weights import resample_with_weights
    from ti_tpu.gedmd.rff import bootstrap_generator_eigenvalues, sample_rff_gaussian

    @dataclasses.dataclass
    class Harmonic:
        def __call__(self, x):
            return 0.5 * np.asarray(x) ** 2

    beta0, beta1 = 0.5, 1.25
    rng = np.random.default_rng(3)
    m = 6000
    x0 = rng.normal(0.0, np.sqrt(1.0 / beta0), m)
    s = np.sqrt(beta0 / beta1)
    x1 = s * x0
    # saved dlogp convention: log q(x1) - log p0(x0) = -log s for x1 = s x0
    dlogps = np.full(m, -np.log(s))

    x1_out, w = calculate_weights(
        x0, x1[None], dlogps[None], beta1, beta0=beta0, potential=Harmonic()
    )
    np.testing.assert_allclose(x1_out, x1)
    assert np.std(np.log(w)) < 1e-6  # perfect transport => constant weights

    Omega = sample_rff_gaussian(0, 1, 64, 0.5)
    for samples, weights in (
        (x1_out, w),  # TI route
        (x0, direct_weights(x0, beta0, beta1, potential=Harmonic())),  # direct
    ):
        res = resample_with_weights(samples, weights, seed=0)
        mean, lo, hi = bootstrap_generator_eigenvalues(
            res.reshape(1, -1), Omega, nev=4, a=2.0 / beta1, tol=1e-4,
            n_bootstrap=50, seed=0,
        )
        # the pipeline returns NEGATED eigenvalues (decay rates), like the
        # reference's bootstrap_eigenvalues
        np.testing.assert_allclose(np.real(mean), [3.0, 2.0, 1.0, 0.0], atol=0.35)
