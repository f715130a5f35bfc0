"""Data ingest, SDF parsing, and config system tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ti_tpu.config import ADWConfig, MDQM9Config, ambient_preset, clone_config, latent_preset, load_config
from ti_tpu.data.adw import ADWDataset, make_synthetic_adw_csv
from ti_tpu.data.mdqm9 import (
    MDQM9AmbientDataset,
    MDQM9LatentDataset,
    make_synthetic_frames,
    make_synthetic_molecule,
    scaling_factor_for,
)
from ti_tpu.data.sdf import parse_sdf_v2000

SDF_SAMPLE = """mol0
  test

  4  3  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    1.5000    0.0000    0.0000 O   0  0  0  0  0  0  0  0  0  0  0  0
   -1.0000    1.0000    0.0000 H   0  0  0  0  0  0  0  0  0  0  0  0
   -1.0000   -1.0000    0.0000 H   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  2  0
  1  3  1  0
  1  4  1  0
M  END
$$$$
mol1
  test

  2  1  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 N   0  0  0  0  0  0  0  0  0  0  0  0
    1.1000    0.0000    0.0000 N   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  3  0
M  END
$$$$
"""


def test_sdf_parser(tmp_path):
    path = tmp_path / "test.sdf"
    path.write_text(SDF_SAMPLE)
    mol = parse_sdf_v2000(str(path), 0)
    np.testing.assert_array_equal(mol.atomic_numbers, [6, 8, 1, 1])
    assert mol.bond_index.shape == (2, 6)  # bidirectional
    # double bond C=O present in both directions
    pairs = {(int(s), int(d)): int(t) for s, d, t in zip(*mol.bond_index, mol.bond_types)}
    assert pairs[(0, 1)] == 2 and pairs[(1, 0)] == 2
    assert pairs[(0, 2)] == 1
    mol1 = parse_sdf_v2000(str(path), 1)
    np.testing.assert_array_equal(mol1.atomic_numbers, [7, 7])
    assert parse_sdf_v2000(str(path))[1].name == "mol1"


def test_adw_dataset_roundtrip(tmp_path):
    csv = make_synthetic_adw_csv(str(tmp_path / "samples.csv"), betas=[1.0, 1.25], n_samples=2000)
    ds = ADWDataset.from_csv(csv, [1.0], n_samples=1500, seed=0)
    assert len(ds) == 1500 and ds.x.shape == (1500, 1)
    assert np.all(ds.beta == 1.0)
    tr, va, te = ds.splits()
    assert len(tr) == 1200 and len(va) == 150 and len(te) == 150
    xs, bs = tr.epoch_batches(jax.random.PRNGKey(0), 128)
    assert xs.shape == (9, 128, 1) and bs.shape == (9, 128, 1)
    # two-beta load stacks both columns
    ds2 = ADWDataset.from_csv(csv, [1.0, 1.25], seed=0)
    assert set(np.unique(ds2.beta)) == {1.0, 1.25}


def test_mdqm9_synthetic_pipeline(tmp_path):
    mol = make_synthetic_molecule(n_atoms=7, seed=0)
    frames = {T: make_synthetic_frames(mol, 64, T, seed=T) for T in (300, 500)}
    ds = MDQM9AmbientDataset.from_arrays(
        np.concatenate([frames[300], frames[500]]),
        np.concatenate([np.full(64, 300.0), np.full(64, 500.0)]),
        mol,
    )
    x, t = ds.epoch_batches(jax.random.PRNGKey(0), 16)
    assert x.shape == (8, 16, 7, 3) and t.shape == (8, 16)
    assert ds.template.edges.n_nodes == 7
    # COM centered frames
    np.testing.assert_allclose(np.asarray(x).mean(axis=2), 0.0, atol=1e-5)


def test_mdqm9_npy_ingest(tmp_path):
    # fabricate the on-disk layout the reference expects:
    # traj_path/split/00031.npy with shape (8, frames, atoms, 3)
    mol = make_synthetic_molecule(n_atoms=5, seed=1)
    os.makedirs(tmp_path / "train", exist_ok=True)
    all_T = np.stack([make_synthetic_frames(mol, 32, T, seed=T) for T in range(300, 1001, 100)])
    np.save(tmp_path / "train" / "00031.npy", all_T)

    sdf = tmp_path / "mdqm9.sdf"
    # build a tiny sdf with 00031 at index 0 won't match int('00031')=31...
    # use from_arrays path for the template and load_trajs for the frames
    from ti_tpu.data.mdqm9 import load_trajs

    frames = load_trajs(str(tmp_path), "train", "00031.npy", 500, scale=True)
    assert frames.shape == (32, 5, 3)
    np.testing.assert_allclose(frames.mean(axis=1), 0.0, atol=1e-5)
    assert scaling_factor_for("00031.npy") == pytest.approx(0.09729941375)
    assert scaling_factor_for("10506.npy") == pytest.approx(0.13163184188306332)
    assert scaling_factor_for("other.npy") == pytest.approx(0.20754094)


def test_latent_dataset_alignment():
    mol = make_synthetic_molecule(n_atoms=6, seed=2)
    frames = make_synthetic_frames(mol, 48, 300, seed=0)
    ds = MDQM9LatentDataset.from_arrays(frames, np.full(48, 300.0), mol, t_cond=1, align=True)
    x0, x1, T = ds.epoch_batches(jax.random.PRNGKey(0), 16)
    assert x0.shape == x1.shape == (3, 16, 6, 3)
    # noise is COM-free
    np.testing.assert_allclose(np.asarray(x0).mean(axis=2), 0.0, atol=1e-5)
    # alignment should not increase RMSD vs unaligned noise
    ds2 = MDQM9LatentDataset.from_arrays(frames, np.full(48, 300.0), mol, t_cond=1, align=False)
    x0u, x1u, _ = ds2.epoch_batches(jax.random.PRNGKey(0), 16)
    rmsd_a = float(jnp.sqrt(jnp.mean((x0 - x1) ** 2)))
    rmsd_u = float(jnp.sqrt(jnp.mean((x0u - x1u) ** 2)))
    assert rmsd_a <= rmsd_u + 1e-6


def test_config_roundtrip(tmp_path):
    cfg = ambient_preset("00031", leave_out=300, batch_size=4)
    assert cfg.T0s == [400, 500, 600, 700, 800, 900, 1000]
    assert cfg.sampling_T1 == 300 and cfg.batch_size == 4
    assert cfg.n_features == 128
    cfg2 = ambient_preset("10506", leave_out=700)
    assert cfg2.n_features == 256 and 700 not in cfg2.T0s

    out = clone_config(cfg, str(tmp_path), "test")
    loaded = load_config(out)
    assert isinstance(loaded, MDQM9Config)
    assert loaded.T0s == cfg.T0s and loaded.batch_size == 4

    lat = latent_preset("00031", Ts=[800])
    assert lat.model_save_name == "00031_latent_800K"
    # reference latent-grid constants (mdqm9/config/latent/*.json):
    # temp_length 75, 25k samples, batch 256 (10 only for 00031 allTs)
    assert lat.temp_length == 75.0 and lat.n_latent_samples == 25_000
    assert lat.batch_size == 256 and lat.n_steps == 400
    assert latent_preset("00031").batch_size == 10
    lat_all = latent_preset("10506")
    assert len(lat_all.T) == 8
    assert lat_all.n_features == 256 and lat_all.batch_size == 256

    adw = ADWConfig()
    out2 = clone_config(adw, str(tmp_path), "adw")
    loaded2 = load_config(out2)
    assert isinstance(loaded2, ADWConfig)

    with pytest.raises(KeyError):
        load_config(out, nonexistent_key=1)


def test_compute_dtype_config_mapping():
    import jax.numpy as jnp

    from ti_tpu.config import MDQM9Config
    from ti_tpu.sampling.drivers import _compute_dtype

    assert _compute_dtype(MDQM9Config()) is None
    assert _compute_dtype(MDQM9Config(compute_dtype="bf16")) is jnp.bfloat16
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _compute_dtype(MDQM9Config(compute_dtype="fp8"))


def test_fast_profile():
    """config.fast_profile applies the qualified throughput profile with
    the SCALE-QUALIFIED probe count (BASELINE.md probe-study rows) and
    keeps explicit overrides."""
    from ti_tpu.config import fast_profile

    small = fast_profile(ambient_preset("00031", 300))
    assert (small.solver_type, small.n_steps) == ("rk4", 8)
    assert (small.dlogp_quad, small.dlogp_quad_points) == ("gauss", 8)
    assert (small.divergence, small.num_probes) == ("hutchinson", 16)
    assert small.compute_dtype == "bf16_agg"
    assert small.steps_per_dispatch == 25
    # round-4 adoption: pair-kernel trajectory segments at 00031 capacity
    assert small.traj_forward_impl == "pair_kernel"

    large = fast_profile(ambient_preset("10506", 300))  # n_features=256
    assert (large.num_probes, large.n_steps) == (32, 16)
    # round-5 adoption: the bf16-VMEM kernel trajectory qualified at 10506
    # capacity (BASELINE.md round-5 row)
    assert large.traj_forward_impl == "pair_kernel_bf16"

    over = fast_profile(ambient_preset("00031", 300), num_probes=24, divergence="exact")
    assert (over.num_probes, over.divergence) == (24, "exact")

    # latent family: only the latent-qualified settings (RK4-64 oracle,
    # bf16 production chain); the divergence estimator is untouched
    lat = fast_profile(latent_preset("00031", Ts=[800]), family="latent")
    assert (lat.solver_type, lat.n_steps) == ("rk4", 64)
    assert (lat.divergence, lat.compute_dtype) == ("exact", "bf16")
    assert lat.dlogp_quad == "gauss"

    with pytest.raises(TypeError):
        fast_profile(ADWConfig())
    with pytest.raises(ValueError):
        fast_profile(ambient_preset("00031", 300), family="sde")


def test_fast_profile_cli_flag():
    """--fast_profile on the train/sample CLIs applies the profile while
    explicit flags keep winning."""
    from scripts.mdqm9_train_ambient import parse as parse_ambient
    from scripts.mdqm9_train_latent import parse as parse_latent

    cfg = parse_ambient(["--preset", "00031:300", "--fast_profile",
                         "--num_probes", "24"])
    assert (cfg.divergence, cfg.num_probes) == ("hutchinson", 24)
    assert cfg.compute_dtype == "bf16_agg"

    cfg = parse_latent(["--preset", "00031:800", "--fast_profile"])
    assert (cfg.divergence, cfg.n_steps) == ("exact", 64)  # latent family
    assert (cfg.dlogp_quad, cfg.compute_dtype) == ("gauss", "bf16")


def test_reference_configs_load_verbatim(tmp_path, capsys):
    """A reference user's existing JSON files must load unchanged
    (MIGRATION.md): dead reference keys are skipped with a warning,
    n_samples aliases to n_latent_samples for the mdqm9 families, and
    genuinely unknown keys still raise."""
    import json as _json

    adw = {"a": 0.9, "beta0s": [1.0], "beta1s": [1.25],
           "beta_trains": [0.25, 0.5], "sampling_model": "x/epoch_1.pt"}
    p = tmp_path / "adw.json"
    p.write_text(_json.dumps(adw))
    cfg = load_config(str(p), ADWConfig)
    assert cfg.a == 0.9 and not hasattr(cfg, "beta_trains")

    lat = {"train_size": 0.8, "num_workers": 8, "n_samples": 25000,
           "temp_length": 75, "T": [800]}
    p = tmp_path / "lat.json"
    p.write_text(_json.dumps(lat))
    cfg = load_config(str(p), MDQM9Config)
    assert cfg.n_latent_samples == 25000 and cfg.temp_length == 75

    bad = tmp_path / "bad.json"
    bad.write_text(_json.dumps({"n_fetures": 128}))
    with pytest.raises(KeyError):
        load_config(str(bad), MDQM9Config)

    # when the reference tree is present, sweep its actual files verbatim
    import glob

    ref = "/root/reference"
    if os.path.isdir(os.path.join(ref, "adw", "config")):
        for path in glob.glob(os.path.join(ref, "adw", "config", "*.json")):
            load_config(path, ADWConfig)
        for path in glob.glob(os.path.join(ref, "mdqm9", "config", "*", "*.json")):
            load_config(path, MDQM9Config)
