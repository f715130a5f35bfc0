"""End-to-end physics pipelines: reweighted gEDMD on ADW, results report."""

import numpy as np
import pytest

from ti_tpu.analysis.kinetics import (
    beta_kj_per_mol,
    best_hyperparameters,
    model_selection_scan,
    torsion_generator_spectrum,
)
from ti_tpu.analysis.potentials import BoltzmannDensity1D
from ti_tpu.analysis.reweight import (
    calculate_weights,
    direct_reweighted_gedmd_spectrum,
    direct_weights,
    reweighted_gedmd_spectrum,
)
from ti_tpu.analysis.results import (
    gen_bond_lengths,
    gen_free_energy_bg,
    gen_free_energy_tfep_md_ti,
    gen_torsions,
    gen_z_matrix,
    generate_report,
)
from ti_tpu.analysis.sort_atoms import adjacency_from_bonds
from ti_tpu.data.mdqm9 import make_synthetic_frames, make_synthetic_molecule


def test_direct_reweighting_recovers_target_spectrum():
    """Reweight beta=2 MD samples to beta=1 and check the gEDMD spectrum is
    closer to the beta=1 direct estimate than the unweighted one would be.
    Exact i.i.d. samples stand in for MD (reversible gEDMD needs only the
    stationary density)."""
    dens2 = BoltzmannDensity1D(beta=2.0)
    samples2 = dens2.sample(0, 20_000)

    out = direct_reweighted_gedmd_spectrum(
        samples2, initial_beta=2.0, target_beta=1.0, p=50, sigma=0.6,
        nev=3, cut_svd=1e-4, n_bootstrap=50, seed=0,
    )
    # stationary eigenvalue 0 present; spectrum finite and ordered
    assert out["eigenvalues_mean"].shape == (3,)
    assert abs(out["eigenvalues_mean"][-1]) < 0.1  # -(-0) = 0 stationary
    assert np.all(np.diff(out["eigenvalues_mean"]) <= 1e-9)  # descending after negation
    assert np.all(out["lower_bound"] <= out["upper_bound"] + 1e-9)


def test_ti_reweighting_pipeline_identity_transport():
    """With identity transport (x1=x0, dlogp=0) between equal betas, the TI
    weights are exp(E(x0)(beta0-beta)) -> all equal at beta=beta0=1."""
    dens = BoltzmannDensity1D(beta=1.0)
    x0 = dens.sample(1, 5000)
    target = np.stack([x0, x0])  # (n_save=2, n)
    dlogps = np.zeros((2, 5000))
    x1, w = calculate_weights(x0, target, dlogps, beta=1.0)
    np.testing.assert_allclose(w, 1.0, rtol=1e-5)

    out = reweighted_gedmd_spectrum(
        x0, target, dlogps, beta=1.0, p=40, sigma=0.6, nev=3,
        cut_svd=1e-4, n_bootstrap=30, seed=0,
    )
    assert abs(out["eigenvalues_mean"][-1]) < 0.1
    assert out["n_filtered"] == 0


def test_direct_weights_formula():
    w = direct_weights(np.array([1.0]), 0.5, 1.0)
    # E(1) = 0.5 -> w = exp((0.5-1.0)*0.5)
    assert w[0] == pytest.approx(np.exp(-0.25), rel=1e-6)


def test_torsion_generator_spectrum_shapes():
    rng = np.random.default_rng(0)
    torsions = rng.uniform(-np.pi, np.pi, (3, 2000))
    out = torsion_generator_spectrum(
        torsions, T=300.0, p=60, sigma=5.0, nev=3, n_bootstrap=20, seed=0
    )
    assert out["eigenvalues_mean"].shape == (3,)
    assert out["beta"] == pytest.approx(beta_kj_per_mol(300.0))
    assert np.isfinite(out["eigenvalues_mean"]).all()


def test_model_selection_scan_small():
    dens = BoltzmannDensity1D(beta=1.0)
    X = dens.sample(2, 2000).reshape(1, -1)
    scan = model_selection_scan(
        X, a=2.0, sigma_list=(0.6, 10.0), p_list=(30,), ntest=2, cut_svd=1e-4
    )
    assert scan["EV"].shape == (2, 1, 2, 4)
    sigma, p = best_hyperparameters(scan)
    assert p == 30 and sigma in (0.6, 10.0)


def test_generate_report_end_to_end(tmp_path):
    mol = make_synthetic_molecule(n_atoms=9, seed=0)
    frames = make_synthetic_frames(mol, 200, 300, seed=1)
    adj = adjacency_from_bonds(mol.n_atoms, mol.bond_index)

    rng = np.random.default_rng(0)
    E0s = rng.normal(10.0, 1.0, 200)
    E1s = E0s + rng.normal(0.5, 0.2, 200)
    nd = rng.normal(0.0, 0.1, 200)
    z0 = rng.standard_normal((200, 9, 3))

    report = generate_report(
        adj, frames, neg_dlogps_ti=nd, E0s=E0s, E1s=E1s,
        latent_z=z0, neg_dlogps_bg=nd, n_bootstrap=50,
        save_path=str(tmp_path), tag="t",
    )
    assert report["torsions"].shape == (200, 6)
    assert report["bond_lengths"].shape == (200, 8)
    assert np.all(report["bond_lengths"] > 0)
    dF, (lo, hi) = report["dF_tfep_md_ti"]
    assert lo <= dF <= hi
    ess, (elo, ehi) = report["ess_md_ti"]
    assert 1 <= ess <= 200
    assert (tmp_path / "torsions_t.npy").exists()
    assert (tmp_path / "dF_tfep_md_ti_t.npy").exists()


def test_gen_z_matrix_valid_geometry():
    mol = make_synthetic_molecule(n_atoms=7, seed=3)
    frames = make_synthetic_frames(mol, 16, 300, seed=3)
    adj = adjacency_from_bonds(mol.n_atoms, mol.bond_index)
    z = gen_z_matrix(adj, frames)
    assert z.shape == (16, 6, 3)
    assert np.all(gen_bond_lengths(z) > 0)
    t = gen_torsions(z)
    assert np.all((t > -np.pi - 1e-6) & (t <= np.pi + 1e-6))
