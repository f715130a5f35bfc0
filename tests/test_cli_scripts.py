"""CLI entry-point smoke tests: the user-facing script surface.

Exercises scripts/ end-to-end via subprocess on synthetic data laid out
exactly like the reference expects on disk (traj_path/split/<mol>.npy with
the (8, frames, atoms, 3) temperature axis; mdqm9.sdf with the molecule at
its file_id index).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)


def run(args, cwd=REPO, timeout=420):
    r = subprocess.run(
        [sys.executable] + args, cwd=cwd, env=ENV, capture_output=True,
        text=True, timeout=timeout,
    )
    assert r.returncode == 0, f"{args}\nSTDOUT:{r.stdout[-2000:]}\nSTDERR:{r.stderr[-2000:]}"
    return r


def _write_sdf(path, mol, index):
    """SDF with `index+1` records; the target molecule is last (file_id)."""
    lines = []
    n, nb = mol.n_atoms, mol.bond_index.shape[1] // 2
    for rec in range(index + 1):
        lines.append(f"mol{rec}\n  synthetic\n")
        lines.append(f"{n:3d}{nb:3d}  0  0  0  0  0  0  0  0999 V2000")
        for i in range(n):
            x, y, z = mol.positions[i]
            sym = {1: "H", 6: "C", 7: "N", 8: "O"}[int(mol.atomic_numbers[i])]
            lines.append(f"{x:10.4f}{y:10.4f}{z:10.4f} {sym:<3}0  0  0  0  0  0  0  0  0  0  0  0")
        seen = set()
        for s, d, t in zip(*mol.bond_index, mol.bond_types):
            if (d, s) in seen:
                continue
            seen.add((s, d))
            lines.append(f"{s + 1:3d}{d + 1:3d}{t:3d}  0")
        lines.append("M  END\n$$$$")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture(scope="module")
def adw_workspace(tmp_path_factory):
    from ti_tpu.data.adw import make_synthetic_adw_csv

    tmp = tmp_path_factory.mktemp("cli_adw")
    make_synthetic_adw_csv(str(tmp / "samples.csv"), betas=[1.0, 1.25], n_samples=3000)
    return tmp


@pytest.mark.slow
def test_adw_train_sample_reweight_cli(adw_workspace):
    tmp = adw_workspace
    common = [
        "--traj_path", str(tmp), "--model_save_path", str(tmp / "models"),
        "--data_save_path", str(tmp / "out"), "--n_samples", "2000",
        "--hidden_size", "16", "--num_layers", "2", "--epochs", "2",
        "--batch_size", "256", "--n_step", "8", "--solver_type", "rk4",
        "--sampling_epoch", "1",
    ]
    run(["scripts/adw_train.py"] + common)
    run(["scripts/adw_sample.py"] + common)
    out_dir = tmp / "out" / "velocity" / "beta_1.0_to_1.25"
    assert (out_dir / "samples_epoch_1.npy").exists()
    assert (out_dir / "dlogps_epoch_1.npy").exists()
    # samples saved by the fixed-step path are (n_save, n); the reweighting
    # CLI consumes exactly these artifacts
    r = run([
        "scripts/adw_reweight_gedmd.py", "--data_dir", str(tmp / "out" / "velocity"),
        "--epoch", "1", "--betas", "1.25", "--n_bootstrap", "20",
        "--p", "20", "--out", str(tmp / "gedmd.npz"),
    ])
    assert "lambda_2" in r.stdout
    assert (tmp / "gedmd.npz").exists()
    # direct Boltzmann-reweighting baseline (dir_reweight_gedmd.py parity):
    # consumes only the initial samples, no transport artifacts
    r = run([
        "scripts/adw_reweight_gedmd.py", "--data_dir", str(tmp / "out" / "velocity"),
        "--epoch", "1", "--betas", "1.25", "--n_bootstrap", "20",
        "--p", "20", "--direct", "--out", str(tmp / "gedmd_direct.npz"),
    ])
    assert "lambda_2" in r.stdout
    assert (tmp / "gedmd_direct.npz").exists()


@pytest.fixture(scope="module")
def mdqm9_workspace(tmp_path_factory):
    from ti_tpu.data.mdqm9 import make_synthetic_frames, make_synthetic_molecule

    tmp = tmp_path_factory.mktemp("cli_mdqm9")
    mol = make_synthetic_molecule(n_atoms=5, seed=0)
    mol_index = 31
    for split in ("train", "test"):
        os.makedirs(tmp / "trajs" / split, exist_ok=True)
        all_T = np.stack(
            [make_synthetic_frames(mol, 24, T, seed=T, jitter=0.3) for T in range(300, 1001, 100)]
        )
        np.save(tmp / "trajs" / split / "00031.npy", all_T)
    _write_sdf(tmp / "mdqm9.sdf", mol, mol_index)
    return tmp


@pytest.mark.slow
def test_mdqm9_train_sample_results_cli(mdqm9_workspace):
    tmp = mdqm9_workspace
    common = [
        "--traj_path", str(tmp / "trajs"), "--sdf_path", str(tmp),
        "--model_save_path", str(tmp / "models"),
        "--data_save_path", str(tmp / "out"),
        "--n_features", "8", "--score_layers", "1", "--batch_size", "8",
        "--n_epochs", "1", "--n_steps", "4", "--solver_type", "rk4",
        "--model_epoch", "0", "--model_save_name", "smoke",
        "--data_save_name", "smoke",
    ]
    run(["scripts/mdqm9_train_ambient.py", "--preset", "00031:300"] + common)
    run(["scripts/mdqm9_sample_ambient.py", "--preset", "00031:300"] + common)
    assert (tmp / "out" / "samples_smoke.npy").exists()
    assert (tmp / "out" / "dlogps_smoke.npy").exists()
    n_unsharded = len(np.load(tmp / "out" / "samples_smoke.npy"))

    # one-call qualified fast profile over the same checkpoint (explicit
    # CPU-sized flags win over the profile: tiny probe count / step grid)
    run(
        ["scripts/mdqm9_sample_ambient.py", "--preset", "00031:300"]
        + common
        + ["--fast_profile", "--num_probes", "2", "--n_steps", "4",
           "--data_save_name", "smoke_fast"]
    )
    lp_fast = np.load(tmp / "out" / "dlogps_smoke_fast.npy")
    assert np.isfinite(lp_fast).all()

    # multi-host fan-out over the same CLI, then merge back
    (tmp / "out" / "samples_smoke.npy").unlink()
    for i in ("0", "1"):
        run(
            ["scripts/mdqm9_sample_ambient.py", "--preset", "00031:300"]
            + common + ["--shard", i, "--num_shards", "2"]
        )
    assert (tmp / "out" / "samples_smoke_shard1of2.npy").exists()
    run(["scripts/merge_shards.py", str(tmp / "out"), "2"])
    assert len(np.load(tmp / "out" / "samples_smoke.npy")) == n_unsharded

    r = run([
        "scripts/mdqm9_results.py", "--sdf", str(tmp / "mdqm9.sdf"),
        "--mol_index", "31", "--data_dir", str(tmp / "out"), "--tag", "smoke",
        "--n_bootstrap", "10", "--out", str(tmp / "results"),
    ])
    assert (tmp / "results" / "torsions_smoke.npy").exists()


@pytest.mark.slow
def test_mdqm9_latent_cli(mdqm9_workspace):
    tmp = mdqm9_workspace
    common = [
        "--traj_path", str(tmp / "trajs"), "--sdf_path", str(tmp),
        "--model_save_path", str(tmp / "models"),
        "--data_save_path", str(tmp / "outl"),
        "--n_features", "8", "--score_layers", "1", "--batch_size", "8",
        "--n_epochs", "1", "--n_steps", "4", "--solver_type", "rk4",
        "--model_epoch", "0", "--model_save_name", "smokel",
        "--data_save_name", "smokel", "--n_latent_samples", "16",
        "--sampling_T", "800",
    ]
    run(["scripts/mdqm9_train_latent.py", "--preset", "00031:800"] + common)
    run(["scripts/mdqm9_sample_latent.py", "--preset", "00031:800"] + common)
    assert (tmp / "outl" / "samples_smokel_forward.npy").exists()


def test_model_selection_cli(tmp_path):
    """VAMP-CV hyperparameter scan CLI: ADW-artifact and torsions modes."""
    rng = np.random.default_rng(0)
    d = tmp_path / "velocity" / "beta_1.0_to_1.25"
    os.makedirs(d)
    # OU-ish 1-D trajectory as the (n_save, n) ADW samples layout
    x = np.zeros(4000)
    for i in range(1, len(x)):
        x[i] = 0.95 * x[i - 1] + 0.3 * rng.standard_normal()
    np.save(d / "samples_epoch_1.npy", np.stack([x, x]))

    r = run([
        "scripts/model_selection.py", "--adw_dir", str(tmp_path / "velocity"),
        "--epoch", "1", "--beta", "1.25", "--sigmas", "0.3", "0.6",
        "--ps", "20", "40", "--ntest", "3", "--out", str(tmp_path / "scan.npz"),
    ])
    assert "best by mean VAMP score" in r.stdout
    scan = np.load(tmp_path / "scan.npz")
    assert scan["VAMP"].shape == (2, 2, 3)

    tors = rng.uniform(-np.pi, np.pi, (500, 3))
    np.save(tmp_path / "torsions_run.npy", tors)
    r = run([
        "scripts/model_selection.py", "--torsions", str(tmp_path / "torsions_run.npy"),
        "--T", "300", "--sigmas", "3.0", "--ps", "20", "--ntest", "2",
        "--out", str(tmp_path / "scan2.npz"),
    ])
    assert "best by mean VAMP score: sigma=3.0, p=20" in r.stdout


def test_eval_energy_cli_gated(tmp_path):
    """Without OpenMM the energy CLI exits 2 with env instructions (the
    reference's separate-conda-env decoupling, ti_energy_env.yml)."""
    r = subprocess.run(
        [sys.executable, "scripts/eval_energy.py", "--sdf", "x.sdf",
         "--mol_index", "0", "--data_dir", str(tmp_path), "--tag", "t",
         "--T0", "1000", "--T1", "300", "--charges", "c.npy"],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 2, (r.returncode, r.stdout, r.stderr)
    assert "dedicated energy environment" in r.stderr


def test_mdqm9_results_full_report_cli(tmp_path):
    """Full multi-source report mode: reference-layout artifacts for all
    sources (ambient_md, ambient_lti, latent at T0/T1, MD trajectories)
    in one command, artifact-name parity with results_00031.py:291-340."""
    from ti_tpu.data.mdqm9 import make_synthetic_frames, make_synthetic_molecule

    mol = make_synthetic_molecule(n_atoms=5, seed=0)
    mol_index = 31
    _write_sdf(tmp_path / "mdqm9.sdf", mol, mol_index)

    rng = np.random.default_rng(0)
    n, tag = 40, "full"

    def frames(seed, m=n):
        return make_synthetic_frames(mol, m, 300, seed=seed)

    def save_source(d, with_latent):
        os.makedirs(d)
        s = np.stack([frames(1), frames(2)], axis=1)  # (n, n_save=2, N, 3)
        np.save(d / f"samples_{tag}.npy", s)
        np.save(d / f"dlogps_{tag}.npy", rng.normal(0, 0.1, n))
        np.save(d / f"E0s_{tag}.npy", rng.normal(10, 0.5, n))
        np.save(d / f"E1s_{tag}.npy", rng.normal(10, 0.5, n))
        if with_latent:
            np.save(d / f"latent_noises_{tag}.npy", rng.standard_normal((n, 5, 3)))
            np.save(d / f"latent_dlogps_{tag}.npy", rng.normal(0, 0.1, n))

    save_source(tmp_path / "ambient_md", with_latent=False)
    save_source(tmp_path / "ambient_lti", with_latent=True)

    latent = tmp_path / "latent"
    os.makedirs(latent)
    for T in (1000, 300):
        s = np.stack([rng.standard_normal((n, 5, 3)), frames(T)], axis=1)
        np.save(latent / f"samples_{T}K.npy", s)
        np.save(latent / f"dlogps_{T}K.npy", rng.normal(0, 0.1, n))
        np.save(latent / f"Es_{T}K.npy", rng.normal(10, 0.5, n))

    for split in ("train",):
        os.makedirs(tmp_path / "trajs" / split)
        all_T = np.stack(
            [make_synthetic_frames(mol, 24, T, seed=T) for T in range(300, 1001, 100)]
        )
        np.save(tmp_path / "trajs" / split / "00031.npy", all_T)

    r = run([
        "scripts/mdqm9_results.py", "--sdf", str(tmp_path / "mdqm9.sdf"),
        "--mol_index", "31", "--tag", tag,
        "--md_ti_dir", str(tmp_path / "ambient_md"),
        "--bg_ti_dir", str(tmp_path / "ambient_lti"),
        "--latent_dir", str(latent), "--T0", "1000", "--T1", "300",
        "--traj_path", str(tmp_path / "trajs"),
        "--scaling_factor", "1.0", "--n_bootstrap", "10",
        "--out", str(tmp_path / "results"),
    ])
    assert "dF (BG Ref.):" in r.stdout and "ESS (BG at T0):" in r.stdout

    from tests.test_pipelines import REFERENCE_00031_ARTIFACTS

    saved = {p.name[:-4] for p in (tmp_path / "results").glob("*.npy")}
    missing = REFERENCE_00031_ARTIFACTS - saved
    assert not missing, f"missing reference artifacts: {sorted(missing)}"

    # the 10506 figure path from the same artifacts: marginals vs the MD
    # reference (incl. the bond_lengths_md_1 naming-quirk fallback) + TICA,
    # reweighted with the report's saved weights (results_10506.py +
    # 10506_marginals.ipynb shape)
    r = run([
        "scripts/mdqm9_plots.py", "--results_dir", str(tmp_path / "results"),
        "--tag", "md_ti_1", "--ref_tag", "md_T1",
        "--weights", "weights_md_ti", "--lag", "2",
        "--out", str(tmp_path / "figures"),
    ])
    for fig in ("torsions_md_ti_1", "bond_angles_md_ti_1",
                "bond_lengths_md_ti_1", "tica_md_ti_1"):
        assert (tmp_path / "figures" / f"{fig}.png").exists(), fig

    # weights/marginals mismatch fails with both paths named (ADVICE r1)
    np.save(tmp_path / "results" / "weights_short.npy", np.ones(7))
    r = subprocess.run(
        [sys.executable, "scripts/mdqm9_plots.py",
         "--results_dir", str(tmp_path / "results"),
         "--tag", "md_ti_0", "--weights", "weights_short",
         "--out", str(tmp_path / "figures2")],
        cwd=REPO, env=ENV, capture_output=True, text=True,
    )
    assert r.returncode != 0
    assert "length mismatch" in r.stderr


@pytest.mark.slow
def test_probe_mode_study_cli(tmp_path):
    """The probe-distribution study runs end to end and reports the
    orthogonal frame's K=dim exactness (rms ~ 0) alongside the iid
    Rademacher rows (ROADMAP open-lever harness)."""
    import json as _json

    r = run([
        "scripts/probe_mode_study.py", "--atoms", "3", "--features", "8",
        "--layers", "1", "--keys", "3", "--probes", "3,9", "--nodes", "1",
    ])
    line = [l for l in r.stdout.splitlines() if l.startswith("rows: ")][-1]
    rows = {(x["mode"], x["K"]): x for x in _json.loads(line[len("rows: "):])}
    assert rows[("orthogonal", 9)]["rms_err"] < 1e-4  # exact at K = d
    assert rows[("rademacher", 9)]["rms_err"] > 1e-3  # iid draws are not
    assert ("orthogonal", 3) in rows and ("rademacher", 3) in rows


@pytest.mark.slow
def test_mdqm9_sample_sde_cli(mdqm9_workspace):
    """SDE sampling CLI: trains a tiny ambient model, then transports the
    test split with Euler-Maruyama (no dlogp) and writes the _sde artifact
    family next to the ODE sampler's; the pair_kernel drift impl (interpret
    mode is not reachable via CLI, so CPU runs the kernel lowered by the
    interpreter only on TPU builds — here we use the dense impl)."""
    tmp = mdqm9_workspace
    common = [
        "--traj_path", str(tmp / "trajs"), "--sdf_path", str(tmp),
        "--model_save_path", str(tmp / "models"),
        "--data_save_path", str(tmp / "out_sde"),
        "--n_features", "8", "--score_layers", "1", "--batch_size", "8",
        "--n_epochs", "1", "--n_steps", "4", "--solver_type", "rk4",
        "--model_epoch", "0", "--model_save_name", "smoke_sde_model",
        "--data_save_name", "smoke",
    ]
    run(["scripts/mdqm9_train_ambient.py", "--preset", "00031:300"] + common)
    run(["scripts/mdqm9_sample_sde.py", "--preset", "00031:300"] + common
        + ["--sde_g", "0.05"])
    samples = np.load(tmp / "out_sde" / "samples_smoke_sde.npy")
    x0 = np.load(tmp / "out_sde" / "initial_samples_smoke_sde.npy")
    assert samples.ndim == 4 and samples.shape[0] == len(x0)
    assert np.all(np.isfinite(samples))
    assert not (tmp / "out_sde" / "dlogps_smoke_sde.npy").exists()
