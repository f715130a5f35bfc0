"""Plotting layer: marginals figures, in-repo TICA."""

import numpy as np
import pytest

from ti_tpu.analysis.plots import plot_marginals, plot_tica, reweighted_hist, tica, torsion_features


def test_reweighted_hist_normalized():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(5000)
    c, h = reweighted_hist(x, bins=50)
    width = c[1] - c[0]
    assert np.sum(h) * width == pytest.approx(1.0, rel=1e-6)


def test_tica_recovers_slow_direction():
    """2-D process: dim 0 slow OU (strong autocorrelation), dim 1 fast noise.
    TICA's top component must align with dim 0."""
    rng = np.random.default_rng(1)
    n = 20_000
    slow = np.zeros(n)
    for i in range(1, n):
        slow[i] = 0.99 * slow[i - 1] + 0.1 * rng.standard_normal()
    fast = rng.standard_normal(n)
    X = np.stack([slow, fast], axis=1)
    ev, proj = tica(X, lag=10, dim=2)
    assert ev[0] > 0.8  # slow mode autocorrelation at lag
    # projection 0 correlates with slow coordinate
    corr = np.corrcoef(proj[:, 0], slow)[0, 1]
    assert abs(corr) > 0.95


def test_torsion_features_shape():
    t = np.random.default_rng(2).uniform(-np.pi, np.pi, (100, 6))
    f = torsion_features(t)
    assert f.shape == (100, 12)
    np.testing.assert_allclose(f[:, :6] ** 2 + f[:, 6:] ** 2, 1.0, rtol=1e-6)


def test_plot_marginals_writes_file(tmp_path):
    rng = np.random.default_rng(3)
    gen = rng.uniform(-np.pi, np.pi, (1000, 5))
    ref = rng.uniform(-np.pi, np.pi, (1000, 5))
    w = rng.uniform(0.5, 2.0, 1000)
    out = tmp_path / "marginals.png"
    plot_marginals(gen, ref, weights=w, kind="torsion", out_path=str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_plot_tica_writes_file(tmp_path):
    rng = np.random.default_rng(4)
    md = rng.uniform(-np.pi, np.pi, (2000, 4))
    gen = rng.uniform(-np.pi, np.pi, (500, 4))
    out = tmp_path / "tica.png"
    plot_tica(md, gen, lag=5, out_path=str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_mdqm9_plots_cli(tmp_path):
    """scripts/mdqm9_plots.py renders marginals + TICA from results arrays,
    with reweighting from sampling/energy artifacts."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.default_rng(5)
    res = tmp_path / "results"
    res.mkdir()
    n = 400
    for tag, m in (("run", n), ("md", 800)):
        np.save(res / f"torsions_{tag}.npy", rng.uniform(-np.pi, np.pi, (m, 3)))
        np.save(res / f"bond_angles_{tag}.npy", rng.uniform(1.5, 2.2, (m, 3)))
        np.save(res / f"bond_lengths_{tag}.npy", rng.uniform(1.0, 1.6, (m, 4)))
    data = tmp_path / "out"
    energies = tmp_path / "energies"
    data.mkdir(), energies.mkdir()
    np.save(data / "dlogps_run.npy", rng.standard_normal(n))
    np.save(energies / "E0s_run.npy", rng.standard_normal(n))
    np.save(energies / "E1s_run.npy", rng.standard_normal(n))

    r = subprocess.run(
        [sys.executable, "scripts/mdqm9_plots.py", "--results_dir", str(res),
         "--tag", "run", "--ref_tag", "md", "--data_dir", str(data),
         "--energy_dir", str(energies), "--lag", "5",
         "--out", str(tmp_path / "figs")],
        cwd=repo, capture_output=True, text=True, timeout=300,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo, MPLBACKEND="Agg"),
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    for kind in ("torsions", "bond_angles", "bond_lengths", "tica"):
        p = tmp_path / "figs" / f"{kind}_run.png"
        assert p.exists() and p.stat().st_size > 1000, p
    assert "reweighting with" in r.stdout


def test_adw_plots_cli(tmp_path):
    """scripts/adw_plots.py renders the lambda2-vs-beta figure from the
    reweight-CLI npz artifacts (reweighted + direct baseline)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.default_rng(6)
    for name in ("rw", "direct"):
        np.savez(
            tmp_path / f"{name}.npz",
            betas=np.array([1.25, 1.5]),
            eigenvalues_mean=rng.uniform(0.01, 0.1, (2, 4)),
            lower=rng.uniform(0.005, 0.01, (2, 4)),
            upper=rng.uniform(0.1, 0.2, (2, 4)),
        )
    r = subprocess.run(
        [sys.executable, "scripts/adw_plots.py",
         "--reweighted", str(tmp_path / "rw.npz"),
         "--direct", str(tmp_path / "direct.npz"),
         "--out", str(tmp_path / "fig.png")],
        cwd=repo, capture_output=True, text=True, timeout=120,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo, MPLBACKEND="Agg"),
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert (tmp_path / "fig.png").stat().st_size > 1000


def test_plot_eigenvalues_vs_T_writes_file(tmp_path):
    rng = np.random.default_rng(7)
    curves = {}
    for src, temps in (("md", [300.0, 500.0, 700.0]), ("md_ti", [300.0, 500.0])):
        n_T = len(temps)
        mean = np.sort(rng.uniform(0.1, 3.0, (n_T, 4)), axis=1)[:, ::-1]
        mean[:, -1] = 0.0  # stationary eigenvalue in the descending layout
        curves[src] = (np.asarray(temps), mean, mean - 0.05, mean + 0.05)
    from ti_tpu.analysis.plots import plot_eigenvalues_vs_T

    out = tmp_path / "eigs.png"
    plot_eigenvalues_vs_T(curves, out_path=str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_mdqm9_gedmd_cli_and_kinetics_figure(tmp_path):
    """scripts/mdqm9_gedmd.py sweeps temperatures into the reference's
    {src}_eigenvalues_{mean,lower_bound,upper_bound}.npy artifacts
    (10506_main.ipynb inputs, reference mdqm9/analysis/gedmd.py), then
    scripts/mdqm9_plots.py --eigs_dir renders the eigenvalue-vs-T figure."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.default_rng(8)
    for T in (300, 500):
        t = rng.vonmises(0.0, 4.0 * 300.0 / T, size=(1200, 3))
        np.save(tmp_path / f"torsions_{T}k.npy", t)
    np.save(tmp_path / "weights_300k.npy", np.ones(1200))
    np.save(tmp_path / "weights_500k.npy", np.ones(1200))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo, MPLBACKEND="Agg")

    kin = tmp_path / "kin"
    r = subprocess.run(
        [sys.executable, "scripts/mdqm9_gedmd.py",
         "--pattern", str(tmp_path / "torsions_{T}k.npy"),
         "--temps", "300,500", "--src", "md_ti",
         "--p", "40", "--n_bootstrap", "8", "--out_dir", str(kin)],
        cwd=repo, capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    for part in ("eigenvalues_mean", "eigenvalues_lower_bound",
                 "eigenvalues_upper_bound", "temps"):
        p = kin / f"md_ti_{part}.npy"
        assert p.exists(), p
    mean = np.load(kin / "md_ti_eigenvalues_mean.npy")
    lo = np.load(kin / "md_ti_eigenvalues_lower_bound.npy")
    hi = np.load(kin / "md_ti_eigenvalues_upper_bound.npy")
    assert mean.shape == (2, 4) and np.isfinite(mean).all()
    assert np.all(lo <= hi + 1e-12)

    # weights path: uniform weights must not crash (resample-then-bootstrap)
    r = subprocess.run(
        [sys.executable, "scripts/mdqm9_gedmd.py",
         "--pattern", str(tmp_path / "torsions_{T}k.npy"),
         "--weights_pattern", str(tmp_path / "weights_{T}k.npy"),
         "--temps", "300", "--src", "bg_ti",
         "--p", "40", "--n_bootstrap", "4", "--out_dir", str(kin)],
        cwd=repo, capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    r = subprocess.run(
        [sys.executable, "scripts/mdqm9_plots.py", "--eigs_dir", str(kin),
         "--out", str(tmp_path / "figs")],
        cwd=repo, capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "md_ti" in r.stdout and "bg_ti" in r.stdout
    p = tmp_path / "figs" / "eigenvalues_vs_T.png"
    assert p.exists() and p.stat().st_size > 1000


def test_mdqm9_plots_overlay_cli(tmp_path):
    """--overlay renders the 00031_main multi-source reweighted-marginals
    figure: tag[:weights] pairs against the MD reference."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.default_rng(9)
    res = tmp_path / "results"
    res.mkdir()
    for tag, n in (("md_ti_1", 500), ("bg_ti_1", 400), ("md_T1", 900)):
        np.save(res / f"torsions_{tag}.npy", rng.vonmises(0.5, 2.0, (n, 3)))
    np.save(res / "weights_md_ti.npy", rng.uniform(0.5, 2.0, 500))
    r = subprocess.run(
        [sys.executable, "scripts/mdqm9_plots.py", "--results_dir", str(res),
         "--overlay", "md_ti_1:weights_md_ti,bg_ti_1", "--ref_tag", "md_T1",
         "--out", str(tmp_path / "figs")],
        cwd=repo, capture_output=True, text=True, timeout=300,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo, MPLBACKEND="Agg"),
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    p = tmp_path / "figs" / "torsions_overlay.png"
    assert p.exists() and p.stat().st_size > 1000
    assert "md_ti_1" in r.stdout and "bg_ti_1" in r.stdout

    # mismatched weights must fail with the two lengths in the message
    np.save(res / "weights_bad.npy", np.ones(7))
    r = subprocess.run(
        [sys.executable, "scripts/mdqm9_plots.py", "--results_dir", str(res),
         "--overlay", "md_ti_1:weights_bad", "--out", str(tmp_path / "figs")],
        cwd=repo, capture_output=True, text=True, timeout=300,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo, MPLBACKEND="Agg"),
    )
    assert r.returncode != 0 and "mismatch" in (r.stdout + r.stderr)


def test_molecule_frames_render(tmp_path):
    """plot_molecule_frames renders the reference's frames/*.png assets
    in-repo; the CLI accepts raw samples npy (optionally with an SDF for
    elements/bonds)."""
    import os
    import subprocess
    import sys

    from ti_tpu.analysis.plots import plot_molecule_frames
    from ti_tpu.data.mdqm9 import make_synthetic_frames, make_synthetic_molecule

    mol = make_synthetic_molecule(n_atoms=7, seed=4)
    frames = make_synthetic_frames(mol, 5, 300, seed=0)
    out = tmp_path / "frames.png"
    plot_molecule_frames(frames, mol.atomic_numbers, mol.bond_index, out_path=str(out))
    assert out.exists() and out.stat().st_size > 1000

    # sampler-artifact layout is batch-major (n, n_save, atoms, 3)
    # (drivers.py incremental saves): the CLI must render each sample's
    # final conformation, i.e. slice [:, -1], not a single chain's times
    from ti_tpu.analysis.plots import frames_from_artifact

    art = np.stack([np.full_like(frames, 99.0), frames], axis=1)  # t0 junk, t1 real
    np.testing.assert_array_equal(frames_from_artifact(art), frames)
    np.testing.assert_array_equal(frames_from_artifact(frames), frames)

    npy = tmp_path / "samples_x.npy"
    np.save(npy, art)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "scripts/mdqm9_plots.py", "--frames", str(npy),
         "--max_frames", "4", "--out", str(tmp_path / "figs")],
        cwd=repo, capture_output=True, text=True, timeout=300,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo, MPLBACKEND="Agg"),
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    p = tmp_path / "figs" / "frames_samples_x.png"
    assert p.exists() and p.stat().st_size > 1000


def test_adw_schematic_cli(tmp_path):
    """--schematic draws the double-well + Boltzmann-densities method
    figure (reference toc.ipynb / 00031_main.ipynb plot_double_well)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "toc.png"
    r = subprocess.run(
        [sys.executable, "scripts/adw_plots.py", "--schematic",
         "--betas", "1.0", "1.25", "--out", str(out)],
        cwd=repo, capture_output=True, text=True, timeout=120,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo, MPLBACKEND="Agg"),
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert out.exists() and out.stat().st_size > 1000
