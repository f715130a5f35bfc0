"""gEDMD with random Fourier features as batched XLA linear algebra.

TPU-native rebuild of the reference gEDMD package (gedmd/rff.py,
gedmd/rff_tools.py, gedmd/util.py — itself derived from the public
KoopmanLib). Same math, restructured for the hardware:

- The m×p complex feature matrix M = exp(-i XᵀΩ) is never materialized as
  complex: all data-sized contractions are expressed through the real
  cos/sin parts (two real matmuls per Gram block → MXU), and only tiny
  p×p complex matrices reach the eigensolvers.
- All reductions over the m data points collapse to p×p Grams first, so the
  whitened eigenproblem R = L† (M†AM) L is computed without ever forming V
  (m×r): V = M L exactly, hence V† Mt L = L† (M†Mt) L.
- The 1000× bootstrap (reference adw/analysis/reweight_gedmd.py:45-59 — a
  Python loop re-running the full pipeline) becomes ONE vmapped computation
  over multinomial count vectors: resampling a dataset only reweights its
  Gram matrices, G_w = M† diag(w) M.
- SVD-based whitening (gedmd/util.py:34-69) is replaced by the equivalent
  Hermitian eigendecomposition of the Gram (s_i = sqrt(lambda_i)), with
  rank truncation done by masking + a -inf diagonal pad so shapes stay
  static under jit.

Conventions match the reference exactly: eigenvalues sorted ascending by
real part, top ``nev`` retained, generator assumed reversible with constant
diffusion a (ML = -a/2 (ΩᵀΩ) ∘ (M†M), gedmd/rff.py:115).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_NEG_PAD = -1e30  # masked (rank-truncated) modes sort to the bottom


# ---------------------------------------------------------------------------
# RFF frequency sampling (reference gedmd/rff_tools.py)
# ---------------------------------------------------------------------------

def sample_rff_gaussian(key: Array, d: int, p: int, sigma: float) -> Array:
    """Spectral-measure sample for the Gaussian kernel: Ω = σ⁻¹ randn(d, p)."""
    return (1.0 / sigma) * jax.random.normal(key, (d, p))


def sample_rff_gauss_periodic(
    key: Array, d: int, p: int, L: float, sigma: float, kmax: int
) -> Array:
    """Spectral-measure sample for the periodic Gaussian kernel.

    Bessel-weighted wavenumber grid (reference rff_tools.py:35-66); the
    Bessel weights are computed host-side (scipy.special.iv has no JAX
    counterpart) and the draw is a jax categorical.
    """
    from scipy.special import iv  # host-side only

    omega0 = np.pi / L
    kvec = np.arange(-kmax, kmax + 1)
    pvec = iv(kvec, sigma ** (-2)) / np.exp(sigma ** (-2))
    pvec = pvec / pvec.sum()
    idx = jax.random.categorical(key, jnp.log(jnp.asarray(pvec)), shape=(d, p))
    return omega0 * jnp.asarray(kvec)[idx].astype(jnp.float32)


# ---------------------------------------------------------------------------
# Feature Grams (real cos/sin arithmetic; MXU-friendly)
# ---------------------------------------------------------------------------

def _theta(X: Array, Omega: Array) -> Array:
    """θ = XᵀΩ, so M = exp(-iθ) = cosθ - i sinθ. X: (d, m), Ω: (d, p)."""
    return X.T @ Omega


def _gram(theta_a: Array, theta_b: Array, weights: Optional[Array] = None) -> Array:
    """G = M_a† M_b as a complex (p, p), via four real matmuls.

    M = C - iS ⇒ M_a† M_b = (Ca+iSa)ᵀ W (Cb-iSb)
                = (CaᵀWCb + SaᵀWSb) + i(SaᵀWCb - CaᵀWSb).
    """
    ca, sa = jnp.cos(theta_a), jnp.sin(theta_a)
    cb, sb = jnp.cos(theta_b), jnp.sin(theta_b)
    if weights is not None:
        cb = cb * weights[:, None]
        sb = sb * weights[:, None]
    re = ca.T @ cb + sa.T @ sb
    im = sa.T @ cb - ca.T @ sb
    return re + 1j * im


def rff_matrices_koopman(X: Array, Y: Array, Omega: Array) -> Tuple[Array, Array]:
    """Complex feature matrices (M, Mt) = exp(-i XᵀΩ), exp(-i YᵀΩ).

    Direct port of M_RFF_Koopman (gedmd/rff.py:48-68) for callers that want
    the raw features; the spectral routines below avoid materializing these.
    """
    ta, tb = _theta(X, Omega), _theta(Y, Omega)
    return jnp.exp(-1j * ta), jnp.exp(-1j * tb)


def rff_gram_generator(
    X: Array, Omega: Array, a: float, weights: Optional[Array] = None
) -> Tuple[Array, Array]:
    """(G, ML) for the reversible constant-diffusion generator.

    G = M†WM, ML = -a/2 (ΩᵀΩ) ∘ G (reference M_RFF_Generator reversible
    branch, gedmd/rff.py:115). ``weights`` are optional per-sample counts
    (bootstrap reweighting).
    """
    th = _theta(X, Omega)
    G = _gram(th, th, weights)
    ML = -0.5 * a * (Omega.T @ Omega) * G
    return G, ML


# ---------------------------------------------------------------------------
# Whitening + eigen-filtering (reference gedmd/util.py)
# ---------------------------------------------------------------------------

def whitening_transform(G: Array, tol: float, rmin: int = 0) -> Tuple[Array, Array]:
    """Masked whitening L (p, p) from the Hermitian Gram G = M†M.

    Equivalent to the reference's truncated SVD of PhiX = M†
    (gedmd/util.py:34-69): singular values s_i = sqrt(eigh(G)), truncate
    s/s_max >= tol with a floor of ``rmin`` retained modes. Instead of
    shrinking shapes (jit-hostile) the truncated columns of L are zeroed;
    returns (L, keep_mask) with keep_mask (p,) boolean.
    """
    lam, U = jnp.linalg.eigh(G)  # ascending
    lam = lam[::-1]
    U = U[:, ::-1]
    s = jnp.sqrt(jnp.maximum(lam, 0.0))
    keep = s / s[0] >= tol
    if rmin > 0:
        keep = keep | (jnp.arange(s.shape[0]) < rmin)
    inv_s = jnp.where(keep, 1.0 / jnp.maximum(s, 1e-300), 0.0)
    L = U * inv_s[None, :]
    return L, keep


def filter_ev(d: Array, W: Array, eps1: float = -np.inf, eps2: float = np.inf):
    """Sort ascending by real part; drop eigenvalues outside (eps1, eps2).

    Host-side helper (dynamic shapes) mirroring gedmd/util.py:72-98.
    """
    d = np.asarray(d)
    W = np.asarray(W)
    ind = np.argsort(np.real(d))
    d, W = d[ind], W[:, ind]
    ind = np.where(np.logical_and(np.real(d) > eps1, np.real(d) < eps2))[0]
    return d[ind], W[:, ind]


def split_by_lag(Xfull, lag: int):
    """Time-shifted (X, Y) pairs from one trajectory or a list of them
    (gedmd/util.py:101-124). Host-side, numpy."""
    if isinstance(Xfull, (list, tuple)):
        X = np.concatenate([np.asarray(x)[:, :-lag] for x in Xfull], axis=1)
        Y = np.concatenate([np.asarray(x)[:, lag:] for x in Xfull], axis=1)
        return X, Y
    Xfull = np.asarray(Xfull)
    return Xfull[:, :-lag], Xfull[:, lag:]


# ---------------------------------------------------------------------------
# Spectral analysis (reference gedmd/rff.py:244-342)
# ---------------------------------------------------------------------------

def spectral_analysis_rff_generator(
    X: Array,
    Omega: Array,
    nev: int,
    a: float,
    tol: float = 0.0,
    reversible: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-``nev`` (ascending) eigenpairs of the Koopman generator.

    Reversible constant-diffusion formulation only, like every call site in
    the reference analysis layer (adw/analysis/reweight_gedmd.py:39-43,
    mdqm9/analysis/gedmd.py:36-56). Returns (d (nev,), W (p, nev)) as numpy
    (eigensolve on host — p is tiny).
    """
    if not reversible:
        raise NotImplementedError(
            "non-reversible generator path is not used by any reference "
            "pipeline; use the Koopman-operator analysis instead"
        )
    if isinstance(X, (list, tuple)):
        X = jnp.concatenate([jnp.asarray(x) for x in X], axis=1)
    G, ML = rff_gram_generator(jnp.asarray(X), jnp.asarray(Omega), a)
    L, keep = whitening_transform(G, tol, rmin=nev)
    R = L.conj().T @ ML @ L
    R = R + jnp.diag(jnp.where(keep, 0.0, _NEG_PAD))
    d, Wi = jnp.linalg.eigh(R)  # ascending; padded modes at the bottom
    W = L @ Wi[:, -nev:]
    return np.asarray(d[-nev:]), np.asarray(W)


def spectral_analysis_rff_koopman(
    X, Omega: Array, lag: int, nev: int, tol: float = 0.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-``nev`` eigenpairs of the finite-lag Koopman operator.

    R = L† (M†Mt) L with L from the Gram of the first m-lag points
    (reference gedmd/rff.py:244-280). Non-Hermitian eig runs on host.
    """
    Xs, Ys = split_by_lag(X, lag)
    th_x = _theta(jnp.asarray(Xs), jnp.asarray(Omega))
    th_y = _theta(jnp.asarray(Ys), jnp.asarray(Omega))
    G = _gram(th_x, th_x)
    Gxy = _gram(th_x, th_y)
    L, keep = whitening_transform(G, tol, rmin=nev)
    R = np.asarray(L.conj().T @ Gxy @ L)
    keep_np = np.asarray(keep)
    R = R + np.diag(np.where(keep_np, 0.0, _NEG_PAD))
    d, Wi = np.linalg.eig(R)
    d, Wi = filter_ev(d, Wi, eps1=_NEG_PAD / 2)
    W = np.asarray(L) @ Wi[:, -nev:]
    return d[-nev:], W


# ---------------------------------------------------------------------------
# Bootstrap: ONE vmapped computation instead of a 1000× python loop
# ---------------------------------------------------------------------------

def _hermitian_eigvals_real_embedding(G_re: Array, G_im: Array) -> Array:
    """Eigenvalues of a complex Hermitian p×p via the real symmetric
    2p×2p embedding [[Re, -Im], [Im, Re]] (each eigenvalue doubled) —
    keeps the vmapped bootstrap eigensolves real-arithmetic so they run on
    TPU as well as CPU. Returns the p ascending eigenvalues."""
    top = jnp.concatenate([G_re, -G_im], axis=-1)
    bot = jnp.concatenate([G_im, G_re], axis=-1)
    emb = jnp.concatenate([top, bot], axis=-2)
    lam = jnp.linalg.eigvalsh(emb)  # ascending, pairs
    return lam[..., ::2]


def _generator_eigs_weighted(theta: Array, OtO: Array, a: float, nev: int, tol: float, w: Array):
    """Top-nev ascending generator eigenvalues for one bootstrap weight
    vector (all real arithmetic until the p×p eigensolves)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    cw, sw = c * w[:, None], s * w[:, None]
    g_re = c.T @ cw + s.T @ sw
    g_im = s.T @ cw - c.T @ sw
    # skew part is antisymmetric only up to roundoff; symmetrize
    g_re = 0.5 * (g_re + g_re.T)
    g_im = 0.5 * (g_im - g_im.T)

    # whitening from the real embedding of G
    p = g_re.shape[0]
    top = jnp.concatenate([g_re, -g_im], axis=-1)
    bot = jnp.concatenate([g_im, g_re], axis=-1)
    emb = jnp.concatenate([top, bot], axis=-2)  # (2p, 2p) sym psd
    lam, U = jnp.linalg.eigh(emb)
    lam, U = lam[::-1], U[:, ::-1]  # descending, doubled
    sing = jnp.sqrt(jnp.maximum(lam, 0.0))
    keep = sing / sing[0] >= tol
    keep = keep | (jnp.arange(2 * p) < 2 * nev)
    inv_s = jnp.where(keep, 1.0 / jnp.maximum(sing, 1e-30), 0.0)
    L = U * inv_s[None, :]  # (2p, 2p) real embedding of complex L (cols doubled)

    # ML = -a/2 OtO ∘ G; real embedding blocks share the OtO Hadamard factor
    ml_re = -0.5 * a * OtO * g_re
    ml_im = -0.5 * a * OtO * g_im
    mtop = jnp.concatenate([ml_re, -ml_im], axis=-1)
    mbot = jnp.concatenate([ml_im, ml_re], axis=-1)
    ML = jnp.concatenate([mtop, mbot], axis=-2)

    R = L.T @ ML @ L
    R = R + jnp.diag(jnp.where(keep, 0.0, _NEG_PAD))
    d = jnp.linalg.eigvalsh(R)  # ascending, doubled
    return d[::2][-nev:]  # dedouble, top nev


def bootstrap_generator_eigenvalues(
    X: Array,
    Omega: Array,
    nev: int,
    a: float,
    tol: float = 0.0,
    n_bootstrap: int = 1000,
    key: Optional[Array] = None,
    batch: int = 100,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean, lo95, hi95) of the NEGATED top-nev generator eigenvalues over
    multinomial bootstrap resamples.

    Replaces the reference's python loop re-running gEDMD per resample
    (adw/analysis/reweight_gedmd.py:45-59): resampling only reweights the
    Gram, so the whole bootstrap is a single vmapped weighted-Gram +
    eigensolve, batched to bound memory.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    X = jnp.asarray(X)
    Omega = jnp.asarray(Omega)
    m = X.shape[1]
    theta = _theta(X, Omega)
    OtO = Omega.T @ Omega

    @jax.jit
    def run_batch(k):
        idx = jax.random.randint(k, (batch, m), 0, m)
        counts = jax.vmap(lambda ix: jnp.bincount(ix, length=m))(idx).astype(theta.dtype)
        return jax.vmap(
            lambda w: _generator_eigs_weighted(theta, OtO, a, nev, tol, w)
        )(counts)

    outs = []
    n_batches = -(-n_bootstrap // batch)
    for i in range(n_batches):
        outs.append(np.asarray(run_batch(jax.random.fold_in(key, i))))
    eigs = -np.concatenate(outs, axis=0)[:n_bootstrap]  # negate like the reference
    return (
        eigs.mean(axis=0),
        np.percentile(eigs, 2.5, axis=0),
        np.percentile(eigs, 97.5, axis=0),
    )


# ---------------------------------------------------------------------------
# VAMP cross-validation (reference gedmd/rff.py:126-240, 347-406)
# ---------------------------------------------------------------------------

def _score_generator(theta_test: Array, Omega: Array, a: float, L: Array, keep: Array) -> float:
    """VAMP score of a pre-selected subspace on held-out data
    (reference _score_test_data_generator, gedmd/rff.py:347-377)."""
    G, ML = rff_gram_generator_theta(theta_test, Omega, a)
    M1tM1 = L.conj().T @ G @ L  # (p, p) Gram of M L on test data
    lam, U = jnp.linalg.eigh(M1tM1)
    lam, U = lam[::-1], U[:, ::-1]
    s = jnp.sqrt(jnp.maximum(lam, 0.0))
    ok = (s / jnp.maximum(s[0], 1e-300) >= 1e-10) & keep_sorted_mask(keep)
    inv = jnp.where(ok, 1.0 / jnp.maximum(s, 1e-300), 0.0)
    L0 = L @ (U * inv[None, :])
    R = L0.conj().T @ ML @ L0
    d = jnp.linalg.eigvalsh(R + jnp.diag(jnp.where(ok, 0.0, 0.0)))
    return float(jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0)))


def keep_sorted_mask(keep: Array) -> Array:
    """Mask with the same number of True entries as ``keep`` but packed to
    the front (rank-r prefix), for composing with re-sorted spectra."""
    r = jnp.sum(keep)
    return jnp.arange(keep.shape[0]) < r


def rff_gram_generator_theta(theta: Array, Omega: Array, a: float):
    c, s = jnp.cos(theta), jnp.sin(theta)
    g = (c.T @ c + s.T @ s) + 1j * (s.T @ c - c.T @ s)
    return g, -0.5 * a * (Omega.T @ Omega) * g


def cv_generator_rff(
    X: Array,
    Omega: Array,
    a: float,
    rtrain: float,
    ntest: int,
    nev: int,
    tol: float = 0.0,
    key: Optional[Array] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Repeated random-split VAMP scoring for the reversible generator
    (reference cv_generator_rff, gedmd/rff.py:180-240). Returns
    (eigenvalues (ntest, nev), scores (ntest,))."""
    if key is None:
        key = jax.random.PRNGKey(0)
    if isinstance(X, (list, tuple)):
        X = jnp.concatenate([jnp.asarray(x) for x in X], axis=1)
    X = jnp.asarray(X)
    Omega = jnp.asarray(Omega)
    m = X.shape[1]
    ntrain = int(rtrain * m)
    theta_all = _theta(X, Omega)

    d_out = np.zeros((ntest, nev))
    scores = np.zeros(ntest)
    for ii in range(ntest):
        perm = jax.random.permutation(jax.random.fold_in(key, ii), m)
        tr, te = theta_all[perm[:ntrain]], theta_all[perm[ntrain:]]
        G, ML = rff_gram_generator_theta(tr, Omega, a)
        L, keep = whitening_transform(G, tol, rmin=nev)
        R = L.conj().T @ ML @ L + jnp.diag(jnp.where(keep, 0.0, _NEG_PAD))
        d = jnp.linalg.eigvalsh(R)
        d_out[ii] = np.asarray(d[-nev:])
        scores[ii] = _score_generator(te, Omega, a, L, keep)
    return d_out, scores


def cv_koopman_rff(
    X,
    Omega: Array,
    lag: int,
    rtrain: float,
    ntest: int,
    nev: int,
    tol: float = 0.0,
    eps: float = 1e-4,
    key: Optional[Array] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Repeated random-split VAMP scoring for the finite-lag Koopman
    operator (reference cv_koopman_rff, gedmd/rff.py:126-178)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    Xs, Ys = split_by_lag(X, lag)
    Xs, Ys = jnp.asarray(Xs), jnp.asarray(Ys)
    Omega = jnp.asarray(Omega)
    m = Xs.shape[1]
    ntrain = int(rtrain * m)
    th_x_all = _theta(Xs, Omega)
    th_y_all = _theta(Ys, Omega)

    d_out = np.zeros((ntest, nev), dtype=complex)
    scores = np.zeros(ntest)
    for ii in range(ntest):
        perm = jax.random.permutation(jax.random.fold_in(key, ii), m)
        trx, tex = th_x_all[perm[:ntrain]], th_x_all[perm[ntrain:]]
        try_, tey = th_y_all[perm[:ntrain]], th_y_all[perm[ntrain:]]
        G = _gram(trx, trx)
        Gxy = _gram(trx, try_)
        L, keep = whitening_transform(G, tol, rmin=nev)
        R = np.asarray(L.conj().T @ Gxy @ L)
        keep_np = np.asarray(keep)
        R = R + np.diag(np.where(keep_np, 0.0, _NEG_PAD))
        d, Wi = np.linalg.eig(R)
        d, Wi = filter_ev(d, Wi, eps1=_NEG_PAD / 2, eps2=1.0 + eps)
        Wsub = np.asarray(L) @ Wi[:, -nev:]
        d_out[ii] = d[-nev:]
        # score on test: orthonormalize M_test @ Wsub, sum of eigenvalue real parts
        Gt = np.asarray(_gram(tex, tex))
        Gt_xy = np.asarray(_gram(tex, tey))
        B = Wsub.conj().T @ Gt @ Wsub
        lam, U = np.linalg.eigh(B)
        lam = np.maximum(lam, 1e-30)
        L0 = Wsub @ (U * lam[None, :] ** -0.5)
        Rt = L0.conj().T @ Gt_xy @ L0
        scores[ii] = float(np.sum(np.real(np.linalg.eigvals(Rt))))
    return d_out, scores
