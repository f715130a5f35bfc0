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
    n_samples = None
    if cfg.num_shards > 1:  # multi-host fan-out (parallel/fanout.py)
        from ti_tpu.parallel.fanout import shard_config, shard_slice

        lo, hi = shard_slice(cfg.n_latent_samples, cfg.shard, cfg.num_shards)
        n_samples = hi - lo
        cfg = shard_config(cfg, cfg.shard, cfg.num_shards)

    out = sample_latent(cfg, model, ck["params"], ds.template, n_samples=n_samples)
    print(f"generated {len(out['samples'])} conformations, nfe={out['nfe']}")
