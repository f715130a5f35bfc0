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
    BGRefSource,
    BGTISource,
    MDTISource,
    gen_bond_lengths,
    gen_free_energy_bg,
    gen_free_energy_tfep_md_ti,
    gen_torsions,
    gen_z_matrix,
    generate_full_report,
    generate_report,
)
from ti_tpu.analysis.sort_atoms import adjacency_from_bonds
from ti_tpu.data.mdqm9 import make_synthetic_frames, make_synthetic_molecule


@pytest.mark.slow
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


def test_torsion_spectrum_uses_molecular_diffusion_convention():
    """The molecular kinetics scripts use a = 1/beta
    (mdqm9/analysis/gedmd.py:12) — NOT the ADW pipeline's 2/beta.
    Eigenvalues of the reversible generator are linear in the constant
    diffusion a, so the convention is pinned by comparing against a
    direct bootstrap call at a = 1/beta (and 2x that at a = 2/beta)."""
    from ti_tpu.gedmd.rff import bootstrap_generator_eigenvalues, sample_rff_gaussian

    rng = np.random.default_rng(1)
    torsions = rng.uniform(-np.pi, np.pi, (2, 1500))
    T = 500.0
    out = torsion_generator_spectrum(
        torsions, T=T, p=40, sigma=5.0, nev=3, n_bootstrap=8, seed=0
    )
    Omega = sample_rff_gaussian(0, 2, 40, 5.0)
    beta = beta_kj_per_mol(T)
    mean1, _, _ = bootstrap_generator_eigenvalues(
        np.asarray(torsions, np.float64), Omega, nev=3, a=1.0 / beta,
        tol=1e-4, n_bootstrap=8, seed=0,
    )
    np.testing.assert_allclose(out["eigenvalues_mean"], mean1, rtol=1e-10)
    mean2, _, _ = bootstrap_generator_eigenvalues(
        np.asarray(torsions, np.float64), Omega, nev=3, a=2.0 / beta,
        tol=1e-4, n_bootstrap=8, seed=0,
    )
    np.testing.assert_allclose(2.0 * mean1, mean2, rtol=1e-8)


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


# the reference's complete artifact-name set (results_00031.py:291-340)
REFERENCE_00031_ARTIFACTS = {
    # marginals (8 sources x 3 kinds; note the md_T/md naming quirks)
    *(f"torsions_{s}" for s in
      ("md_ti_0", "md_ti_1", "bg_ti_0", "bg_ti_1", "bg_ref_T0", "bg_ref_T1",
       "md_T1", "md_T0")),
    *(f"bond_angles_{s}" for s in
      ("md_ti_0", "md_ti_1", "bg_ti_0", "bg_ti_1", "bg_ref_T0", "bg_ref_T1",
       "md_T1", "md_T0")),
    *(f"bond_lengths_{s}" for s in
      ("md_ti_0", "md_ti_1", "bg_ti_0", "bg_ti_1", "bg_ref_T0", "bg_ref_T1",
       "md_1", "md_0")),
    # ESS
    "ess_md_ti_percentage", "ess_bg_ti_percentage", "ess_bg_T0_percentage",
    "ess_md_ti_ci_percentage", "ess_bg_ti_ci_percentage",
    "ess_bg_T0_ci_percentage",
    # free energies
    "df_md_ti", "dF_bg_ti_tfep", "dF_bg_ref", "dF_bg_ref_tfep",
    "dF_bg_ref_ci", "dF_bg_ti_tfep_ci", "dF_md_ti_ci", "dF_bg_ref_tfep_ci",
    # importance weights
    "weights_md_ti", "weights_bg_ti_T1", "weights_bg_ti_T0",
    "weights_bg_ref_T0", "weights_bg_ref_T1",
}


def _synthetic_full_report_inputs(n=80, n_atoms=9):
    mol = make_synthetic_molecule(n_atoms=n_atoms, seed=0)
    adj = adjacency_from_bonds(mol.n_atoms, mol.bond_index)
    rng = np.random.default_rng(7)

    def frames(seed, m=n):
        return make_synthetic_frames(mol, m, 300, seed=seed)

    def es():
        return rng.normal(10.0, 0.5, n)

    def nd():
        return rng.normal(0.0, 0.1, n)

    md_ti = MDTISource(x0s=frames(1), x1s=frames(2), E0s=es(), E1s=es(),
                       neg_dlogps_ti=nd())
    bg_ti = BGTISource(x0s=frames(3), x1s=frames(4),
                       zs=rng.standard_normal((n, n_atoms, 3)),
                       neg_dlogps_bg=nd(), neg_dlogps_ti=nd(),
                       E0s=es(), E1s=es())
    bg0 = BGRefSource(zs=rng.standard_normal((n, n_atoms, 3)), xs=frames(5),
                      neg_dlogps_bg=nd(), Es=es())
    bg1 = BGRefSource(zs=rng.standard_normal((n, n_atoms, 3)), xs=frames(6),
                      neg_dlogps_bg=nd(), Es=es())
    return adj, md_ti, bg_ti, bg0, bg1, frames


def test_generate_full_report_artifact_name_parity(tmp_path):
    """Every array the reference report saves (results_00031.py:291-340)
    must come out of one generate_full_report call, under the same name."""
    adj, md_ti, bg_ti, bg0, bg1, frames = _synthetic_full_report_inputs()

    report = generate_full_report(
        adj, md_ti=md_ti, bg_ti=bg_ti, bg_ref_T0=bg0, bg_ref_T1=bg1,
        md_T0=frames(7, 40), md_T1=frames(8, 40),
        n_bootstrap=25, save_path=str(tmp_path),
    )

    saved = {p.name[:-4] for p in tmp_path.glob("*.npy")}
    missing = REFERENCE_00031_ARTIFACTS - saved
    assert not missing, f"missing reference artifacts: {sorted(missing)}"

    # IQR filtering ties weights to the target-side marginals in lockstep
    # (results_00031.py:267-279)
    assert len(report["weights_md_ti"]) == len(report["torsions_md_ti_1"])
    assert len(report["weights_bg_ti_T1"]) == len(report["torsions_bg_ti_1"])
    # source-side marginals stay unfiltered
    assert len(report["torsions_md_ti_0"]) == 80
    # weights_bg_ti_T0 / bg_ref weights are saved UNfiltered (:281-283)
    assert len(report["weights_bg_ti_T0"]) == 80
    assert len(report["weights_bg_ref_T0"]) == 80

    for key in ("df_md_ti", "dF_bg_ti_tfep", "dF_bg_ref", "dF_bg_ref_tfep"):
        lo, hi = report[f"dF_{key.split('_', 1)[1]}_ci" if key == "df_md_ti"
                        else f"{key}_ci"]
        assert np.isfinite(report[key]) and lo <= hi

    for key in ("ess_md_ti", "ess_bg_ti", "ess_bg_T0"):
        pct = report[f"{key}_percentage"]
        assert 0 < pct <= 100.0


def test_generate_full_report_partial_sources(tmp_path):
    """Sources are independent: a BG-reference-only call yields the BG dF
    routes and ESS without requiring the TI artifacts."""
    adj, _, _, bg0, bg1, _ = _synthetic_full_report_inputs(n=60)
    report = generate_full_report(
        adj, bg_ref_T0=bg0, bg_ref_T1=bg1, n_bootstrap=20,
        save_path=str(tmp_path),
    )
    assert "dF_bg_ref" in report and "dF_bg_ref_tfep" in report
    assert "ess_bg_T0_percentage" in report
    assert "df_md_ti" not in report
    assert (tmp_path / "torsions_bg_ref_T0.npy").exists()


@pytest.mark.slow
def test_generate_full_report_10506_extras(tmp_path):
    """The 10506 report's additions: z_matrix_* arrays and torsions_h5_md
    (results_10506.py:51-52,90-97)."""
    adj, md_ti, bg_ti, _, _, frames = _synthetic_full_report_inputs(n=30)
    report = generate_full_report(
        adj, md_ti=md_ti, bg_ti=bg_ti, h5_md=frames(9, 20),
        md_T0=frames(10, 20), md_T1=frames(11, 20),
        n_bootstrap=10, save_path=str(tmp_path), save_z_matrices=True,
    )
    assert report["torsions_h5_md"].shape == (20, 6)
    for name in ("z_matrix_md_ti_0", "z_matrix_md_ti_1", "z_matrix_bg_ti_0",
                 "z_matrix_bg_ti_1", "z_matrix_md_T0", "z_matrix_md_T1"):
        assert name in report, name
    assert (tmp_path / "torsions_h5_md.npy").exists()
    assert (tmp_path / "z_matrix_md_ti_0.npy").exists()
