#!/usr/bin/env python
"""Sample the trained ADW model with dlogp (reference: python adw/sample.py)."""
import os
import sys

sys.path.insert(0, ".")

import numpy as np

from scripts.adw_train import parse


if __name__ == "__main__":
    import jax

    from ti_tpu.data.adw import ADWDataset
    from ti_tpu.models.mlp import FCNetMultiBeta
    from ti_tpu.sampling.drivers import sample_adw
    from ti_tpu.train.common import load_checkpoint

    cfg = parse(sys.argv[1:])
    model = FCNetMultiBeta(
        in_size=1, out_size=1, hidden_size=cfg.hidden_size, num_layers=cfg.num_layers
    )
    epoch = cfg.sampling_epoch if cfg.sampling_epoch >= 0 else cfg.epochs - 1
    ck = load_checkpoint(
        os.path.join(cfg.model_save_path, cfg.model_save_name, f"epoch_{epoch}")
    )
    csv = os.path.join(cfg.traj_path, cfg.traj_filename)
    dataset = ADWDataset.from_csv(csv, cfg.beta0s, cfg.n_samples, seed=cfg.seed)
    _, _, test = dataset.splits()
    x, beta = test.x, test.beta.reshape(-1)
    if cfg.num_shards > 1:  # multi-host fan-out (parallel/fanout.py)
        from ti_tpu.parallel.fanout import shard_config, shard_slice

        lo, hi = shard_slice(len(x), cfg.shard, cfg.num_shards)
        x, beta = x[lo:hi], beta[lo:hi]
        cfg = shard_config(cfg, cfg.shard, cfg.num_shards)
    out = sample_adw(cfg, model, ck["params"], x, beta)
    print(f"sampled {out['samples'].shape[1]} chains, nfe={out['nfe']}")
