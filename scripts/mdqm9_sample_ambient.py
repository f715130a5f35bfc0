#!/usr/bin/env python
"""Sample the trained ambient model T0->T1 with dlogp
(reference: python mdqm9/sample_ambient.py), with optional BG->TI
composition from latent trajectories."""
import os
import sys

sys.path.insert(0, ".")

import numpy as np

from scripts.mdqm9_train_ambient import parse


if __name__ == "__main__":
    from ti_tpu.data.mdqm9 import MDQM9AmbientDataset, load_trajs
    from ti_tpu.sampling.drivers import sample_ambient
    from ti_tpu.train.ambient import build_ambient_model
    from ti_tpu.train.common import load_checkpoint

    cfg = parse(sys.argv[1:])
    model = build_ambient_model(cfg)
    ck = load_checkpoint(
        os.path.join(
            cfg.model_save_path, cfg.model_save_name,
            f"{cfg.model_save_name}_{cfg.model_epoch}_weights",
        )
    )
    ds = MDQM9AmbientDataset.load(
        cfg.traj_path, cfg.sdf_path, cfg.mdqm9_traj_filename, cfg.sdf_filename,
        split="test", Ts=[cfg.sampling_T0], scale=cfg.scale_trajs,
    )
    latent_z = latent_dlogp = None
    if cfg.latent_traj_path:
        stem = cfg.mdqm9_traj_filename.split(".")[0]
        latent = np.load(
            os.path.join(cfg.latent_traj_path, f"samples_mol_{stem}_{cfg.sampling_T0}k_forward.npy")
        )[: cfg.n_latent_samples]
        latent_z = latent[:, 0]
        x0 = latent[:, -1]
        latent_dlogp = np.load(
            os.path.join(cfg.latent_traj_path, f"dlogps_mol_{stem}_{cfg.sampling_T0}k_forward.npy")
        )[: cfg.n_latent_samples]
    else:
        x0 = ds.frames

    if cfg.num_shards > 1:  # multi-host fan-out (parallel/fanout.py)
        from ti_tpu.parallel.fanout import shard_config, shard_slice

        lo, hi = shard_slice(len(x0), cfg.shard, cfg.num_shards)
        x0 = x0[lo:hi]
        if latent_z is not None:
            latent_z, latent_dlogp = latent_z[lo:hi], latent_dlogp[lo:hi]
        cfg = shard_config(cfg, cfg.shard, cfg.num_shards)

    out = sample_ambient(cfg, model, ck["params"], ds.template, x0, latent_z, latent_dlogp)
    print(f"sampled {len(out['samples'])} conformations, nfe={out['nfe']}")
