"""gEDMD oracles: Ornstein-Uhlenbeck analytic spectra (SURVEY.md §4).

OU process dX = -kappa X dt + sigma dW has generator eigenvalues -kappa*n
(Hermite eigenfunctions) and Koopman eigenvalues exp(-kappa*n*lag) — exact
references for both estimation paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ti_tpu.gedmd.rff import (
    bootstrap_generator_eigenvalues,
    cv_generator_rff,
    cv_koopman_rff,
    rff_matrices_koopman,
    sample_rff_gaussian,
    spectral_analysis_rff_generator,
    spectral_analysis_rff_koopman,
    split_by_lag,
    whitening_transform,
)
from ti_tpu.sampling.integrators import sample_sde

KAPPA = 1.0
BETA = 1.0  # diffusion a = 2/beta like the reference call sites


def _stationary_samples(m=6000):
    # stationary variance = a / (2 kappa) = 1/ (beta kappa)
    key = jax.random.PRNGKey(0)
    std = np.sqrt(1.0 / (BETA * KAPPA))
    return std * jax.random.normal(key, (1, m))


def test_generator_spectrum_ou():
    X = _stationary_samples()
    Omega = sample_rff_gaussian(1, 1, 64, 0.8)
    d, W = spectral_analysis_rff_generator(X, Omega, nev=4, a=2.0 / BETA, tol=1e-4)
    # ascending: [-3k, -2k, -k, 0]
    np.testing.assert_allclose(np.real(d), [-3.0, -2.0, -1.0, 0.0], atol=0.25)
    assert W.shape == (64, 4)


def test_generator_accepts_trajectory_list():
    X = _stationary_samples(3000)
    Omega = sample_rff_gaussian(1, 1, 48, 0.8)
    d, _ = spectral_analysis_rff_generator(
        [X[:, :1500], X[:, 1500:]], Omega, nev=3, a=2.0, tol=1e-4
    )
    np.testing.assert_allclose(np.real(d)[-1], 0.0, atol=0.05)


def _ou_trajectory(n=60_000, dt=0.01):
    def drift(x, t):
        return -KAPPA * x

    x0 = jnp.array([1.0])
    xs = sample_sde(
        drift,
        x0,
        jax.random.PRNGKey(2),
        g_fn=np.sqrt(2.0 / BETA),
        t0=0.0,
        t1=n * dt,
        n_steps=n,
        n_save=n + 1,
    )
    return np.asarray(xs).T  # (1, n+1)


def test_koopman_spectrum_ou():
    traj = _ou_trajectory()
    lag, dt = 20, 0.01
    Omega = sample_rff_gaussian(3, 1, 64, 0.8)
    d, W = spectral_analysis_rff_koopman(traj, Omega, lag=lag, nev=3, tol=1e-4)
    expected = np.exp(-KAPPA * np.arange(2, -1, -1) * lag * dt)
    np.testing.assert_allclose(np.real(d), expected, atol=0.08)


@pytest.mark.slow
def test_bootstrap_generator_matches_point_estimate():
    X = _stationary_samples(3000)
    Omega = sample_rff_gaussian(4, 1, 50, 0.8)
    mean, lo, hi = bootstrap_generator_eigenvalues(
        X, Omega, nev=4, a=2.0 / BETA, tol=1e-4, n_bootstrap=100, seed=5, chunk=50,
    )
    # negated eigenvalues: [3, 2, 1, 0] (finite-sample bias shrinks them)
    np.testing.assert_allclose(mean, [3.0, 2.0, 1.0, 0.0], atol=0.55)
    assert np.all(lo <= mean + 1e-9) and np.all(mean <= hi + 1e-9)
    d, _ = spectral_analysis_rff_generator(X, Omega, nev=4, a=2.0 / BETA, tol=1e-4)
    np.testing.assert_allclose(mean, -np.real(d), atol=0.3)


def test_bootstrap_tol_zero_degenerate_spectrum_finite():
    """tol=0 keeps every mode; with a rank-deficient feature Gram the
    machine-noise modes must hit the same sqrt(eps)*s_max floor as
    whitening_transform (reference gedmd/util.py:34-69 semantics at
    degenerate spectra) instead of producing ~1e9 whitening columns."""
    X = _stationary_samples(400)
    Omega = sample_rff_gaussian(4, 1, 24, 0.8)
    # duplicated frequencies => exactly rank-deficient Gram
    Omega = np.concatenate([Omega, Omega], axis=1)
    mean, lo, hi = bootstrap_generator_eigenvalues(
        X, Omega, nev=3, a=2.0 / BETA, tol=0.0, n_bootstrap=20, seed=7, chunk=10,
    )
    assert np.all(np.isfinite(mean)) and np.all(np.isfinite(lo)) and np.all(np.isfinite(hi))
    assert np.all(lo <= mean + 1e-9) and np.all(mean <= hi + 1e-9)
    # and the point-estimate route (whitening_transform's guard) stays
    # finite AND consistent with the bootstrap under the same degenerate
    # tol=0 spectrum — the two guard paths agree on which (noise) modes
    # top the whitened spectrum
    d, _ = spectral_analysis_rff_generator(X, Omega, nev=3, a=2.0 / BETA, tol=0.0)
    assert np.all(np.isfinite(np.real(d)))
    np.testing.assert_allclose(mean, -np.real(d), atol=0.5)


def test_whitening_orthonormalizes():
    rng = np.random.default_rng(6)
    theta = rng.standard_normal((500, 16))
    M = np.exp(-1j * theta)
    G = M.conj().T @ M
    L, keep = whitening_transform(G, tol=1e-8, rmin=4)
    R = L.conj().T @ G @ L
    r = int(np.asarray(keep).sum())
    kept = np.asarray(keep)
    np.testing.assert_allclose(R[np.ix_(kept, kept)], np.eye(r), atol=1e-3)


def test_split_by_lag():
    X = np.arange(20, dtype=float).reshape(1, 20)
    a, b = split_by_lag(X, 3)
    np.testing.assert_array_equal(a[0], np.arange(17))
    np.testing.assert_array_equal(b[0], np.arange(3, 20))
    a2, b2 = split_by_lag([X, X], 3)
    assert a2.shape == (1, 34)


def test_rff_matrices_koopman_values():
    X = np.array([[0.0, np.pi / 2]])
    Om = np.array([[1.0]])
    M, Mt = rff_matrices_koopman(X, X, Om)
    np.testing.assert_allclose(M[0], 1.0 + 0j, atol=1e-6)
    np.testing.assert_allclose(M[1], -1j, atol=1e-6)


def test_cv_generator_scores_prefer_good_bandwidth():
    X = _stationary_samples(3000)
    scores = {}
    for sig in (0.8, 20.0):
        Omega = sample_rff_gaussian(7, 1, 50, sig)
        d, s = cv_generator_rff(
            X, Omega, a=2.0, rtrain=0.75, ntest=3, nev=4, tol=1e-4, seed=8,
        )
        # the reference records VAMP = -dtest for the generator
        # (adw/analysis/model_selection.py:44); larger VAMP = better
        scores[sig] = -s.mean()
        assert d.shape == (3, 4)
    assert scores[0.8] > scores[20.0]


def test_cv_koopman_runs():
    traj = _ou_trajectory(20_000)
    Omega = sample_rff_gaussian(9, 1, 40, 0.8)
    d, s = cv_koopman_rff(
        traj, Omega, lag=20, rtrain=0.75, ntest=2, nev=3, tol=1e-4, seed=10,
    )
    assert d.shape == (2, 3)
    assert np.all(np.isfinite(s))
    # slowest mode ~ stationary eigenvalue 1
    np.testing.assert_allclose(np.real(d[:, -1]), 1.0, atol=0.1)


def test_symbolic_basis_values_and_derivatives():
    """SymbolicBasis == closed-form values/gradients/Hessians for a mixed
    monomial/Gaussian/constant dictionary (reference Sym2numeric API,
    gedmd/util.py:128-224)."""
    import sympy

    from ti_tpu.gedmd.symbolic import Sym2numeric, SymbolicBasis

    x, y = sympy.symbols("x y")
    psis = [sympy.Integer(1), x, x**2 * y, sympy.exp(-(x**2) - y**2)]
    basis = SymbolicBasis(psis, [x, y], ndiff=2)
    assert Sym2numeric is SymbolicBasis

    pts = np.array([[0.3, -1.2, 0.0], [0.7, 0.4, -0.5]])  # (d=2, m=3)
    xs, ys = pts

    vals = basis(pts)
    assert vals.shape == (4, 3)
    np.testing.assert_allclose(vals[0], 1.0)
    np.testing.assert_allclose(vals[1], xs, rtol=1e-6)
    np.testing.assert_allclose(vals[2], xs**2 * ys, rtol=1e-6)
    np.testing.assert_allclose(vals[3], np.exp(-(xs**2) - ys**2), rtol=1e-6)

    grads = basis.diff(pts)
    assert grads.shape == (4, 2, 3)
    np.testing.assert_allclose(grads[0], 0.0, atol=1e-12)
    np.testing.assert_allclose(grads[1, 0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(grads[1, 1], 0.0, atol=1e-12)
    np.testing.assert_allclose(grads[2, 0], 2 * xs * ys, rtol=1e-5)
    np.testing.assert_allclose(grads[2, 1], xs**2, rtol=1e-5)
    g = np.exp(-(xs**2) - ys**2)
    np.testing.assert_allclose(grads[3, 0], -2 * xs * g, rtol=1e-5, atol=1e-7)

    hess = basis.ddiff(pts)
    assert hess.shape == (4, 2, 2, 3)
    np.testing.assert_allclose(hess[1], 0.0, atol=1e-12)
    np.testing.assert_allclose(hess[2, 0, 0], 2 * ys, rtol=1e-5)
    np.testing.assert_allclose(hess[2, 0, 1], 2 * xs, rtol=1e-5)
    np.testing.assert_allclose(hess[2, 1, 1], 0.0, atol=1e-10)
    np.testing.assert_allclose(
        hess[3, 0, 0], (4 * xs**2 - 2) * g, rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(hess[3, 0, 1], 4 * xs * ys * g, rtol=1e-5, atol=1e-7)


def test_periodic_rff_frequencies_on_bessel_grid():
    """sample_rff_gauss_periodic (reference rff_tools.py:35-66): frequencies
    are integer multiples of pi/L with Bessel-ratio weights, and the
    resulting features work in the generator pipeline on periodic data."""
    from ti_tpu.gedmd.rff import sample_rff_gauss_periodic

    L, sigma, kmax = np.pi, 1.0, 8
    Om = sample_rff_gauss_periodic(0, 2, 400, L, sigma, kmax)
    assert Om.shape == (2, 400)
    k = Om / (np.pi / L)
    np.testing.assert_allclose(k, np.round(k), atol=1e-12)  # integer grid
    assert np.abs(k).max() <= kmax
    # symmetric distribution, concentrated near 0 for sigma=1
    assert abs(np.mean(k)) < 0.25
    assert (np.abs(k) <= 2).mean() > 0.5

    # torsion-like periodic data flows through the spectral pipeline
    theta = np.random.default_rng(0).uniform(-np.pi, np.pi, (2, 2000))
    d, W = spectral_analysis_rff_generator(theta, Om, nev=3, a=2.0, tol=1e-4)
    assert d.shape == (3,) and np.all(np.isfinite(np.real(d)))


# ---------------------------------------------------------------------------
# non-reversible / general-diffusion branches (reference gedmd/rff.py:70-123)
# ---------------------------------------------------------------------------

def test_generator_spectrum_nonreversible_ou_with_drift():
    """Non-reversible formulation with explicit drift b = -kappa x and
    constant a recovers the same OU spectrum -kappa*n."""
    X = np.asarray(_stationary_samples(8000))
    Omega = sample_rff_gaussian(2, 1, 64, 0.8)
    b = -KAPPA * X  # drift field at all data sites, (d, m)
    d, W = spectral_analysis_rff_generator(
        X, Omega, nev=4, a=2.0 / BETA, b=b, tol=1e-4, reversible=False
    )
    np.testing.assert_allclose(np.real(d), [-3.0, -2.0, -1.0, 0.0], atol=0.25)
    assert np.max(np.abs(np.imag(d))) < 0.1
    assert W.shape == (64, 4)


def test_general_diffusion_tensor_matches_scalar():
    """A (d, d, m) tensor that is the tiled scalar a must reproduce the
    float-a path exactly, in both formulations."""
    from ti_tpu.gedmd.rff import _features, rff_ml_nonreversible, rff_ml_reversible

    X = np.asarray(_stationary_samples(2000))
    Omega = sample_rff_gaussian(3, 1, 32, 0.8)
    a = 2.0
    a_tensor = np.tile(np.eye(1)[:, :, None] * a, (1, 1, X.shape[1]))
    M = _features(np.asarray(X, dtype=np.float64), Omega)

    np.testing.assert_allclose(
        rff_ml_reversible(M, Omega, a_tensor),
        rff_ml_reversible(M, Omega, a), rtol=1e-10, atol=1e-8,
    )
    np.testing.assert_allclose(
        rff_ml_nonreversible(M, Omega, a_tensor),
        rff_ml_nonreversible(M, Omega, a), rtol=1e-10, atol=1e-8,
    )

    d_tensor, _ = spectral_analysis_rff_generator(X, Omega, nev=3, a=a_tensor, tol=1e-4)
    d_scalar, _ = spectral_analysis_rff_generator(X, Omega, nev=3, a=a, tol=1e-4)
    np.testing.assert_allclose(d_tensor, d_scalar, rtol=1e-8, atol=1e-8)


def test_generator_spectrum_anisotropic_constant_matrix():
    """2-D reversible process with stationary N(0, I) and constant matrix
    diffusion a = diag(2, 4): generator eigenvalues are -(n1*1 + n2*2)
    (each coordinate an OU with kappa_i = a_i/2) -> top 4: 0, -1, -2, -2."""
    rng = np.random.default_rng(11)
    m = 20_000
    X = rng.standard_normal((2, m))
    a = np.zeros((2, 2, m))
    a[0, 0] = 2.0
    a[1, 1] = 4.0
    Omega = sample_rff_gaussian(4, 2, 100, 1.0)
    d, _ = spectral_analysis_rff_generator(X, Omega, nev=4, a=a, tol=1e-4)
    np.testing.assert_allclose(np.real(d), [-2.0, -2.0, -1.0, 0.0], atol=0.3)


def _transformed_ou(m=50_000, seed=5, eps=0.1):
    """y = g(x) = x + eps x^3 of a stationary OU (kappa=1, a=2): a diffusion
    with genuinely state-dependent coefficients whose generator spectrum is
    STILL -n (spectra are invariant under smooth invertible changes of
    variables). Ito: g' = 1 + 3 eps x^2, b_y = -x g' + 6 eps x,
    a_y = 2 g'^2."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((1, m))
    y = x + eps * x**3
    gp = 1.0 + 3 * eps * x**2
    b = (-x * gp + 6 * eps * x).reshape(1, m)
    a = (2.0 * gp**2).reshape(1, 1, m)
    return y, a, b


def test_generator_spectrum_state_dependent_diffusion_reversible():
    # tol=1e-2: the reversible quadratic form with state-dependent a is a
    # heavy-tailed estimator whose near-null whitened modes are noisy;
    # aggressive rank truncation suppresses the spurious modes (verified
    # against the quadrature-exact spectrum, which is [-2, -1, 0] at any tol)
    y, a, b = _transformed_ou()
    Omega = sample_rff_gaussian(6, 1, 80, 1.0)
    d, _ = spectral_analysis_rff_generator(y, Omega, nev=3, a=a, tol=1e-2)
    np.testing.assert_allclose(np.real(d), [-2.0, -1.0, 0.0], atol=0.25)


def test_generator_spectrum_state_dependent_diffusion_nonreversible():
    y, a, b = _transformed_ou()
    Omega = sample_rff_gaussian(7, 1, 80, 1.0)
    d, _ = spectral_analysis_rff_generator(
        y, Omega, nev=3, a=a, b=b, tol=1e-4, reversible=False
    )
    np.testing.assert_allclose(np.real(d), [-2.0, -1.0, 0.0], atol=0.25)
    assert np.max(np.abs(np.imag(d))) < 0.15


def test_cv_generator_rff_general_diffusion():
    """CV scoring shuffles the (d, d, m) diffusion alongside the data
    (reference cv_generator_rff, gedmd/rff.py:214-222)."""
    y, a, _ = _transformed_ou(6000)
    Omega = sample_rff_gaussian(8, 1, 40, 1.0)
    d, s = cv_generator_rff(y, Omega, a, rtrain=0.75, ntest=3, nev=3, tol=1e-4)
    assert d.shape == (3, 3) and s.shape == (3,)
    assert np.isfinite(s).all()
    np.testing.assert_allclose(d[:, -1], 0.0, atol=0.1)  # stationary mode
