"""BG→TI composition: latent generator output feeds the ambient sampler.

The reference composes pipelines through .npy artifacts: sample_latent.py
writes samples/dlogps, MDQM9SamplerDataset(use_latent_trajs=True) reads
them and carries latent_z/latent_dlogp through the ambient transport
(mdqm9/data/mdqm9_ambient.py:110-170, sample_ambient.py:76-101), and the
analysis combines both dlogps into BG importance weights (ess.py:13-23).
This exercises the whole composition on tiny models.
"""

import numpy as np
import pytest

from ti_tpu.analysis.weights import calc_ess, calc_importance_weights
from ti_tpu.config import MDQM9Config
from ti_tpu.data.mdqm9 import MDQM9AmbientDataset, MDQM9LatentDataset, make_synthetic_frames, make_synthetic_molecule
from ti_tpu.sampling.drivers import sample_ambient, sample_latent
from ti_tpu.train.ambient import train_ambient
from ti_tpu.train.latent import train_latent


@pytest.mark.slow
def test_bg_to_ti_composition(tmp_path):
    mol = make_synthetic_molecule(n_atoms=5, seed=0)
    frames = {T: make_synthetic_frames(mol, 48, T, seed=T) for T in (400, 500)}
    base = dict(
        n_features=8, score_layers=1, batch_size=8, n_epochs=1,
        model_save_path=str(tmp_path / "models"), data_save_path=str(tmp_path / "out"),
        n_steps=4, solver_type="rk4", T0s=[400, 500], T1s=[400, 500],
        sampling_T0=500, sampling_T1=400, T=[400, 500], sampling_T=500,
    )

    # 1) train + sample the latent generator at T0=500
    lat_cfg = MDQM9Config(**base)
    lat_ds = MDQM9LatentDataset.from_arrays(
        np.concatenate([frames[400], frames[500]]),
        np.concatenate([np.full(48, 400.0), np.full(48, 500.0)]),
        mol, t_cond=1,
    )
    lat = train_latent(lat_cfg, lat_ds)
    lat_out = sample_latent(lat_cfg, lat["model"], lat["params"], lat["template"],
                            n_samples=16, batch_size=8)
    latent_z = lat_out["samples"][:, 0]  # initial noise
    x0_ambient = lat_out["samples"][:, -1]  # generated conformations at T0
    latent_dlogp = lat_out["dlogps"]

    # 2) train the ambient transport and push the BG output 500K -> 400K
    amb_cfg = MDQM9Config(**base)
    stack = np.concatenate([frames[400], frames[500]])
    temps = np.concatenate([np.full(48, 400.0), np.full(48, 500.0)])
    amb = train_ambient(
        amb_cfg,
        MDQM9AmbientDataset.from_arrays(stack, temps, mol),
        MDQM9AmbientDataset.from_arrays(stack, temps, mol),
    )
    out = sample_ambient(
        amb_cfg, amb["model"], amb["params"], amb["template"],
        x0_ambient, latent_z=latent_z, latent_dlogp=latent_dlogp, batch_size=8,
    )

    # artifacts carry the latent bookkeeping through
    assert out["latent_noises"].shape == (16, 5, 3)
    assert out["latent_dlogps"].shape == (16,)
    np.testing.assert_allclose(out["latent_dlogps"], latent_dlogp)

    # 3) BG importance weights combine both dlogps (reference ess.py:13-23)
    E1 = np.random.default_rng(0).normal(5.0, 0.2, 16)
    w = calc_importance_weights(
        out["latent_noises"], E1,
        neg_dlogps_bg=out["latent_dlogps"], neg_dlogps_ti=out["dlogps"],
    )
    assert np.all(np.isfinite(w)) and np.all(w > 0)
    assert 1.0 <= calc_ess(w) <= 16.0
