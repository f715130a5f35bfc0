#!/usr/bin/env python
"""Generate conformations from noise with the trained latent model
(reference: python mdqm9/sample_latent.py)."""
import os
import sys

sys.path.insert(0, ".")

from scripts.mdqm9_train_latent import parse


if __name__ == "__main__":
    from ti_tpu.data.mdqm9 import MDQM9LatentDataset
    from ti_tpu.sampling.drivers import sample_latent
    from ti_tpu.train.common import load_checkpoint
    from ti_tpu.train.latent import build_latent_model

    cfg = parse(sys.argv[1:])
    model = build_latent_model(cfg)
    ck = load_checkpoint(
        os.path.join(
            cfg.model_save_path, cfg.model_save_name,
            f"{cfg.model_save_name}_{cfg.model_epoch}",
        )
    )
    ds = MDQM9LatentDataset.load(
        cfg.traj_path, cfg.sdf_path, cfg.mdqm9_traj_filename, cfg.sdf_filename,
        split="test", Ts=cfg.T, scale=cfg.scale_trajs, align=cfg.align,
    )
    out = sample_latent(cfg, model, ck["params"], ds.template)
    print(f"generated {len(out['samples'])} conformations, nfe={out['nfe']}")
