"""Results pipelines: ESS, free energies, internal-coordinate marginals.

Counterpart of the reference orchestration scripts
(mdqm9/analysis/results_00031.py, results_10506.py): given the sampling
artifacts (samples/dlogps/latent_* .npy) and the energy-stage artifacts
(E0s/E1s .npy), compute every number the paper reports — Kish ESS with
bootstrap CIs for the MD/TI, BG/TI and BG routes, TFEP / BG / BG-TFEP
free-energy differences with bootstrap CIs, and z-matrix marginals
(torsions, bond angles, bond lengths).

The per-metric 1000-iteration python bootstrap loops of the reference
(results_00031.py:30-150) are replaced by the shared vectorized
``bootstrap_ci``; the z-matrix construction is one vectorized JAX call.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ti_tpu.analysis.free_energy import (
    bootstrap_ci,
    calc_bg_dF,
    calc_phis_bg,
    calc_phis_bg_tfep,
    calc_phis_tfep,
    calc_tfep_dF,
)
from ti_tpu.analysis.sort_atoms import compute_atom_order_and_references_groups
from ti_tpu.analysis.weights import calc_ess, calc_importance_weights, calc_ti_weights, filter_iqr
from ti_tpu.analysis.zmatrix import construct_z_matrix


def gen_z_matrix(adjacency: np.ndarray, samples: np.ndarray) -> np.ndarray:
    """(n, N-1, 3) z-matrices from (n, N, 3) cartesians using the
    BFS placement order (reference results_00031.py:16-19)."""
    import jax.numpy as jnp

    atom_order, _, ref_atoms = compute_atom_order_and_references_groups(adjacency)
    sorted_samples = np.asarray(samples)[:, np.asarray(atom_order), :]
    return np.asarray(construct_z_matrix(jnp.asarray(sorted_samples), ref_atoms))


def gen_torsions(z_matrices: np.ndarray) -> np.ndarray:
    """Torsion marginals: column 2, rows 2.. (defined for atoms 3..)."""
    return np.asarray(z_matrices)[:, 2:, 2]


def gen_bond_angles(z_matrices: np.ndarray) -> np.ndarray:
    return np.asarray(z_matrices)[:, 1:, 1]


def gen_bond_lengths(z_matrices: np.ndarray) -> np.ndarray:
    return np.asarray(z_matrices)[:, :, 0]


# ---------------------------------------------------------------------------
# free energies with bootstrap CIs (reference results_00031.py:30-100)
# ---------------------------------------------------------------------------

def gen_free_energy_tfep_md_ti(E0s, E1s, neg_dlogps_ti, n_bootstrap=1000, k=None, seed=0):
    def est(e0, e1, nd):
        phis, _ = calc_phis_tfep(e0, e1, nd, k=k)
        return calc_tfep_dF(phis)

    return bootstrap_ci(est, (np.asarray(E0s), np.asarray(E1s), np.asarray(neg_dlogps_ti)),
                        n_bootstrap=n_bootstrap, seed=seed)


def gen_free_energy_bg(Es_T0, neg_dlogps_bg_T0, Es_T1, neg_dlogps_bg_T1,
                       n_bootstrap=1000, k=None, seed=0):
    """BG route: dF = mean(phi1) - mean(phi0), independent resampling of the
    two ends (reference results_00031.py:50-76)."""
    e0, nd0 = np.asarray(Es_T0), np.asarray(neg_dlogps_bg_T0)
    e1, nd1 = np.asarray(Es_T1), np.asarray(neg_dlogps_bg_T1)

    def est0(e, nd):
        return calc_bg_dF(calc_phis_bg(e, nd, k=k))

    rng = np.random.default_rng(seed)
    point = est0(e1, nd1) - est0(e0, nd0)
    boots = np.empty(n_bootstrap)
    for i in range(n_bootstrap):
        i0 = rng.integers(0, len(e0), len(e0))
        i1 = rng.integers(0, len(e1), len(e1))
        boots[i] = est0(e1[i1], nd1[i1]) - est0(e0[i0], nd0[i0])
    return point, (float(np.percentile(boots, 2.5)), float(np.percentile(boots, 97.5)))


def gen_free_energy_bg_tfep(Es_T0, neg_dlogps_bg_T0, Es_T1, neg_dlogps_bg_T1,
                            n_bootstrap=1000, k=None, seed=0):
    def est(e0, nd0, e1, nd1):
        phis = calc_phis_bg_tfep(e0, nd0, e1, nd1, k=k)
        return calc_tfep_dF(phis)

    return bootstrap_ci(
        est,
        (np.asarray(Es_T0), np.asarray(neg_dlogps_bg_T0), np.asarray(Es_T1), np.asarray(neg_dlogps_bg_T1)),
        n_bootstrap=n_bootstrap, seed=seed,
    )


# ---------------------------------------------------------------------------
# ESS with bootstrap CIs (reference results_00031.py:103-150)
# ---------------------------------------------------------------------------

def gen_ess_ti(E0s, E1s, neg_dlogps_ti, k=None, n_bootstrap=1000, seed=0):
    w = calc_ti_weights(E0s, E1s, neg_dlogps_ti)
    if k is not None:
        w = w[filter_iqr(w, k=k)]
    return bootstrap_ci(lambda ww: calc_ess(ww), (w,), n_bootstrap=n_bootstrap, seed=seed)


def gen_ess_bg(z0s, E1s, neg_dlogps_bg, neg_dlogps_ti, k=None, n_bootstrap=1000, seed=0):
    w = calc_importance_weights(z0s, E1s, neg_dlogps_bg, neg_dlogps_ti)
    if k is not None:
        w = w[filter_iqr(w, k=k)]
    return bootstrap_ci(lambda ww: calc_ess(ww), (w,), n_bootstrap=n_bootstrap, seed=seed)


# ---------------------------------------------------------------------------
# end-to-end report (the shape of results_00031.py:152-343)
# ---------------------------------------------------------------------------

def generate_report(
    adjacency: np.ndarray,
    samples: np.ndarray,
    neg_dlogps_ti: Optional[np.ndarray] = None,
    E0s: Optional[np.ndarray] = None,
    E1s: Optional[np.ndarray] = None,
    latent_z: Optional[np.ndarray] = None,
    neg_dlogps_bg: Optional[np.ndarray] = None,
    k: Optional[float] = 100.0,
    n_bootstrap: int = 1000,
    seed: int = 0,
    save_path: Optional[str] = None,
    tag: str = "results",
) -> Dict:
    """Compute every metric the artifacts allow; optionally np.save each
    array like the reference scripts (~40 arrays, results_00031.py:173-343).

    samples: (n, N, 3) FINAL conformations. neg_dlogps_*: pass the sampler's
    saved dlogp arrays UNCHANGED — "neg_dlogps" is the reference's name for
    exactly that quantity (loaded without a sign flip,
    results_00031.py:180-190).
    """
    out: Dict = {}
    z = gen_z_matrix(adjacency, samples)
    out["z_matrices"] = z
    out["torsions"] = gen_torsions(z)
    out["bond_angles"] = gen_bond_angles(z)
    out["bond_lengths"] = gen_bond_lengths(z)

    have_ti = E0s is not None and E1s is not None and neg_dlogps_ti is not None
    if have_ti:
        out["dF_tfep_md_ti"] = gen_free_energy_tfep_md_ti(
            E0s, E1s, neg_dlogps_ti, n_bootstrap=n_bootstrap, k=k, seed=seed
        )
        out["ess_md_ti"] = gen_ess_ti(E0s, E1s, neg_dlogps_ti, k=k, n_bootstrap=n_bootstrap, seed=seed)

    if latent_z is not None and neg_dlogps_bg is not None and E1s is not None:
        nd_ti = np.zeros(len(E1s)) if neg_dlogps_ti is None else neg_dlogps_ti
        out["ess_bg_ti"] = gen_ess_bg(
            latent_z, E1s, neg_dlogps_bg, nd_ti, k=k, n_bootstrap=n_bootstrap, seed=seed
        )

    if save_path is not None:
        import os

        os.makedirs(save_path, exist_ok=True)
        for name in ("torsions", "bond_angles", "bond_lengths"):
            np.save(os.path.join(save_path, f"{name}_{tag}.npy"), out[name])
        for name in ("dF_tfep_md_ti", "ess_md_ti", "ess_bg_ti"):
            if name in out:
                val, (lo, hi) = out[name]
                np.save(os.path.join(save_path, f"{name}_{tag}.npy"), np.array([val, lo, hi]))
    return out
