"""End-to-end training smoke tests on tiny synthetic problems.

These exercise the full train loops (scan-epochs, NaN-guard, plateau LR,
checkpointing) and the sampling drivers, CPU-sized.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ti_tpu.config import ADWConfig, MDQM9Config
from ti_tpu.data.adw import ADWDataset, make_synthetic_adw_csv
from ti_tpu.data.mdqm9 import (
    MDQM9AmbientDataset,
    MDQM9LatentDataset,
    make_synthetic_frames,
    make_synthetic_molecule,
)
from ti_tpu.sampling.drivers import sample_adw, sample_ambient, sample_latent
from ti_tpu.train.adw import train_adw
from ti_tpu.train.ambient import train_ambient
from ti_tpu.train.latent import train_latent
from ti_tpu.train.common import ReduceLROnPlateau, load_checkpoint


def test_reduce_lr_on_plateau_semantics():
    s = ReduceLROnPlateau(factor=0.5, patience=2)
    lr = 1.0
    lr = s.step(1.0, lr)  # improves (from inf)
    for _ in range(2):
        lr = s.step(1.0, lr)  # no improvement x2 -> still within patience
    assert lr == 1.0
    lr = s.step(1.0, lr)  # 3rd bad epoch > patience -> cut
    assert lr == 0.5


@pytest.fixture(scope="module")
def adw_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("adw")
    csv = make_synthetic_adw_csv(str(tmp / "samples.csv"), betas=[1.0, 1.25], n_samples=4000)
    cfg = ADWConfig(
        n_samples=2000, hidden_size=32, num_layers=2, epochs=3, batch_size=256,
        traj_path=str(tmp), model_save_path=str(tmp / "models"),
        data_save_path=str(tmp / "out"), n_step=8, solver_type="rk4",
    )
    result = train_adw(cfg)
    return cfg, result, tmp


def test_adw_training_decreases_loss(adw_run):
    cfg, result, _ = adw_run
    hist = result["history"]["train_loss"]
    assert all(np.isfinite(hist))
    assert hist[-1] < hist[0]


def test_adw_checkpoint_roundtrip(adw_run):
    cfg, result, tmp = adw_run
    ck = load_checkpoint(os.path.join(cfg.model_save_path, cfg.model_save_name, "epoch_2"))
    for a, b in zip(jax.tree.leaves(ck["params"]), jax.tree.leaves(result["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # config snapshot written
    assert os.path.exists(os.path.join(cfg.model_save_path, cfg.model_save_name, "settings.json"))


def test_load_checkpoint_cross_backend_fallback(tmp_path, monkeypatch):
    """A bare restore that dies on sharding metadata (chip-saved checkpoint
    reopened under JAX_PLATFORMS=cpu — the documented tunnel-stall pivot)
    must fall back to the template-free numpy restore INSIDE
    load_checkpoint, so every call site survives the pivot (VERDICT r3
    weak #3). The failure is simulated by making the bare restore raise the
    way a foreign-device sharding does."""
    import orbax.checkpoint as ocp

    from ti_tpu.train.common import save_checkpoint

    path = str(tmp_path / "ck")
    tree = {
        "params": {"w": jnp.arange(6.0).reshape(3, 2), "b": np.ones(4)},
        "arch": {"atoms": 19, "features": 128},
        "name": "oracle",
    }
    save_checkpoint(path, tree)

    real = ocp.PyTreeCheckpointer.restore
    calls = []

    def fake(self, directory, *args, **kwargs):
        calls.append(bool(kwargs))
        if not args and not kwargs:  # the bare restore only
            raise ValueError(
                "Sharding info not provided when restoring. Got None"
            )
        return real(self, directory, *args, **kwargs)

    monkeypatch.setattr(ocp.PyTreeCheckpointer, "restore", fake)
    out = load_checkpoint(path)
    assert calls == [False, True]  # bare attempt, then the fallback
    assert isinstance(out["params"]["w"], np.ndarray)
    np.testing.assert_allclose(out["params"]["w"], np.arange(6.0).reshape(3, 2))
    np.testing.assert_allclose(out["params"]["b"], np.ones(4))
    assert int(np.asarray(out["arch"]["atoms"])) == 19
    assert out["name"] == "oracle"


def test_adw_sampling_artifacts(adw_run):
    cfg, result, tmp = adw_run
    x0 = np.random.default_rng(0).standard_normal((64, 1)).astype(np.float32)
    out = sample_adw(cfg, result["model"], result["params"], x0, np.ones(64))
    assert out["samples"].shape == (2, 64)  # fixed-step saves start+end
    assert out["dlogps"].shape == (2, 64)
    assert np.all(np.isfinite(out["samples"]))
    d = os.path.join(cfg.data_save_path, cfg.model_save_name, "beta_1.0_to_1.25")
    assert os.path.exists(os.path.join(d, f"samples_epoch_{cfg.sampling_epoch}.npy"))


@pytest.fixture(scope="module")
def mol_data():
    mol = make_synthetic_molecule(n_atoms=6, seed=0)
    frames = {
        T: make_synthetic_frames(mol, 48, T, seed=T) for T in (400, 500)
    }
    return mol, frames


def _tiny_cfg(tmp, **kw):
    base = dict(
        n_features=8, score_layers=1, batch_size=8, n_epochs=2,
        model_save_path=str(tmp / "models"), data_save_path=str(tmp / "out"),
        n_steps=4, solver_type="rk4", T0s=[400, 500], T1s=[400, 500],
        sampling_T0=500, sampling_T1=400, T=[400, 500], sampling_T=400,
    )
    base.update(kw)
    return MDQM9Config(**base)


@pytest.mark.slow
def test_ambient_training_and_sampling(mol_data, tmp_path):
    mol, frames = mol_data
    cfg = _tiny_cfg(tmp_path)
    stack = np.concatenate([frames[400], frames[500]])
    temps = np.concatenate([np.full(48, 400.0), np.full(48, 500.0)])
    ds0 = MDQM9AmbientDataset.from_arrays(stack, temps, mol)
    ds1 = MDQM9AmbientDataset.from_arrays(stack, temps, mol)
    result = train_ambient(cfg, ds0, ds1)
    hist = result["history"]["train_loss"]
    assert all(np.isfinite(hist))
    assert np.isfinite(result["history"]["epoch_best_loss"][-1])

    out = sample_ambient(
        cfg, result["model"], result["params"], result["template"],
        frames[500][:16], batch_size=8,
    )
    assert out["samples"].shape[0] == 16
    assert out["samples"].shape[-2:] == (6, 3)
    assert np.all(np.isfinite(out["samples"])) and np.all(np.isfinite(out["dlogps"]))
    assert os.path.exists(os.path.join(cfg.data_save_path, f"samples_{cfg.data_save_name}.npy"))

    # bf16 mixed-precision sampling path (config key): same artifacts,
    # samples/dlogps within mixed-precision tolerance of the f32 run
    import dataclasses as _dc

    cfg16 = _dc.replace(cfg, compute_dtype="bf16", data_save_name=cfg.data_save_name + "16")
    out16 = sample_ambient(
        cfg16, result["model"], result["params"], result["template"],
        frames[500][:16], batch_size=8,
    )
    assert np.all(np.isfinite(out16["samples"]))
    rms = float(np.sqrt(np.mean((out16["samples"][:, -1] - out["samples"][:, -1]) ** 2)))
    assert rms < 0.05, rms
    assert np.max(np.abs(out16["dlogps"] - out["dlogps"])) < 0.5


@pytest.mark.slow
def test_latent_training_and_sampling(mol_data, tmp_path):
    mol, frames = mol_data
    cfg = _tiny_cfg(tmp_path, n_latent_samples=16)
    ds = MDQM9LatentDataset.from_arrays(
        frames[400], np.full(48, 400.0), mol, t_cond=1, align=True
    )
    result = train_latent(cfg, ds)
    assert all(np.isfinite(result["history"]["train_loss"]))

    out = sample_latent(cfg, result["model"], result["params"], result["template"], n_samples=16, batch_size=8)
    assert out["samples"].shape[0] == 16
    assert np.all(np.isfinite(out["samples"]))


@pytest.mark.slow
def test_latent_single_temperature_unconditioned(mol_data, tmp_path):
    mol, frames = mol_data
    cfg = _tiny_cfg(tmp_path, T=[400], n_epochs=1)
    ds = MDQM9LatentDataset.from_arrays(
        frames[400], np.full(48, 400.0), mol, t_cond=0, align=False
    )
    result = train_latent(cfg, ds)
    assert result["model"].conditioning == "none"
    assert all(np.isfinite(result["history"]["train_loss"]))


@pytest.mark.slow
def test_molecular_sde_batched_matches_euler_ode():
    """sample_molecular_sde with g=0 == the deterministic Euler ODE on the
    dense-pair drift, and the COM projection keeps chains on the zero-COM
    manifold."""
    import jax
    import jax.numpy as jnp

    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.models.cpainn import CPaiNN
    from ti_tpu.sampling.drivers import make_ode_sampler, molecular_v_fn_of, sample_molecular_sde

    mol = make_synthetic_molecule(n_atoms=5, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=8, score_layers=1, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)
    key = jax.random.PRNGKey(1)
    x0 = 0.2 * jax.random.normal(key, (3, 5, 3))
    x0 = x0 - x0.mean(axis=1, keepdims=True)
    temps = jnp.tile(jnp.array([700.0, 300.0]), (3, 1))

    out = sample_molecular_sde(
        model, params, template, x0, temps, key, g_fn=0.0, n_steps=8, n_save=3
    )
    assert out.shape == (3, 3, 5, 3)

    ode = make_ode_sampler(
        molecular_v_fn_of(model, params, template), solver="euler", n_steps=8,
        n_save=3, return_dlogp=False,
    )(x0, temps, key)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ode.xs), rtol=1e-5, atol=1e-6
    )

    # with noise: configurations change, and reruns are deterministic in key
    out2 = sample_molecular_sde(
        model, params, template, x0, temps, key, g_fn=0.3, n_steps=8, n_save=3
    )
    assert float(jnp.max(jnp.abs(out2 - out))) > 1e-3
    out3 = sample_molecular_sde(
        model, params, template, x0, temps, key, g_fn=0.3, n_steps=8, n_save=3
    )
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out2), rtol=0, atol=0)


@pytest.mark.slow
def test_ambient_sampling_dopri5_default_solver(mol_data, tmp_path):
    """The config's DEFAULT solver (adaptive dopri5, the reference's
    setting) through the molecular driver: finite samples/dlogp, adaptive
    nfe, reference-layout artifacts."""
    from ti_tpu.models.cpainn import CPaiNN
    from ti_tpu.data.mdqm9 import graph_template

    mol, frames = mol_data
    cfg = _tiny_cfg(
        tmp_path, solver_type="dopri5", atol=1e-3, rtol=1e-3, n_steps=3,
        data_save_name="dp5",
    )
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=8, score_layers=1, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)
    out = sample_ambient(cfg, model, params, template, frames[500][:4], batch_size=4)
    assert out["samples"].shape[0] == 4
    assert np.all(np.isfinite(out["samples"])) and np.all(np.isfinite(out["dlogps"]))
    assert out["nfe"] >= 14  # at least two accepted DP5 steps of 7 evals
    assert os.path.exists(os.path.join(cfg.data_save_path, "samples_dp5.npy"))


def test_grad_accum_matches_full_batch():
    """accum_steps=K with a key-independent loss reproduces the single-shot
    full-batch update exactly (mean-of-microbatch-grads == full-batch grad
    for a mean-reduced loss with equal microbatches)."""
    import optax

    from ti_tpu.train import common

    w = {"w": jnp.arange(6.0).reshape(2, 3) / 10.0}
    x = jnp.arange(24.0).reshape(8, 3) / 7.0
    y = jnp.linspace(-1, 1, 16).reshape(8, 2)

    def loss_fn(p, key, xb, yb):
        pred = xb @ p["w"].T
        return jnp.mean((pred - yb) ** 2)

    tx = common.make_optimizer(weight_decay=0.0, clip=1.0)
    state = common.init_train_state(w, tx, 1e-2)
    key = jax.random.PRNGKey(0)

    s1, l1 = jax.jit(common.make_update_step(loss_fn, tx))(state, key, x, y)
    s4, l4 = jax.jit(common.make_update_step(loss_fn, tx, accum_steps=4))(state, key, x, y)

    np.testing.assert_allclose(float(l4), float(l1), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s4.params["w"]), np.asarray(s1.params["w"]), rtol=1e-6, atol=1e-7
    )


def test_grad_accum_molecular_loss_runs():
    """The accumulation path composes with the real antithetic molecular
    loss (per-microbatch keys; finite loss and updated params)."""
    from ti_tpu import interpolants
    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.losses import molecular_velocity_loss
    from ti_tpu.models.cpainn import CPaiNN
    from ti_tpu.train import common

    mol = make_synthetic_molecule(n_atoms=4, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=8, score_layers=1, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)
    interp = interpolants.linear(a=1.0, gamma="sin2")

    def loss_fn(p, k, x0, x1, temps):
        return molecular_velocity_loss(
            model.apply, p, k, template, x0, x1, temps, interp
        )

    tx = common.make_optimizer(weight_decay=0.0, clip=1.0)
    state = common.init_train_state(params, tx, 1e-3)
    update = jax.jit(common.make_update_step(loss_fn, tx, accum_steps=2))

    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (8, 4, 3))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (8, 4, 3))
    temps = jnp.tile(jnp.array([700.0, 300.0]), (8, 1))
    new_state, loss = update(state, key, x0, x1, temps)
    assert np.isfinite(float(loss))
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), new_state.params, state.params
    )
    assert max(jax.tree.leaves(diff)) > 0.0


def test_adw_f64_parity_mode(tmp_path):
    """ADWConfig.dtype='f64' (reference adw/train.py:29 float64 training):
    params train in f64 and the sampler runs the trajectory in f64; the
    global x64 flag is restored so the rest of the suite stays f32."""
    was_x64 = jax.config.jax_enable_x64
    try:
        csv = make_synthetic_adw_csv(
            str(tmp_path / "samples.csv"), betas=[1.0, 1.25], n_samples=1200
        )
        cfg = ADWConfig(
            n_samples=600, hidden_size=16, num_layers=2, epochs=2,
            batch_size=128, dtype="f64",
            traj_path=str(tmp_path), model_save_path=str(tmp_path / "models"),
            data_save_path=str(tmp_path / "out"), n_step=4, solver_type="rk4",
        )
        result = train_adw(cfg)
        assert all(
            leaf.dtype == jnp.float64 for leaf in jax.tree.leaves(result["params"])
        )
        assert np.isfinite(result["history"]["train_loss"][-1])

        x0 = np.random.default_rng(0).standard_normal((16, 1))
        out = sample_adw(cfg, result["model"], result["params"], x0,
                         np.ones(16), save=False)
        assert out["samples"].dtype == np.float64
        assert np.all(np.isfinite(out["samples"]))
    finally:
        jax.config.update("jax_enable_x64", was_x64)


def test_adw_dtype_rejects_unknown():
    with pytest.raises(ValueError, match="f32 or f64"):
        from ti_tpu.train.adw import _adw_dtype
        _adw_dtype(ADWConfig(dtype="bf16"))
