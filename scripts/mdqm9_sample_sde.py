#!/usr/bin/env python
"""SDE (Euler–Maruyama) transport of the trained ambient model T0->T1 —
the no-dlogp throughput surface (the driver's north-star metric; the
reference has no SDE branch, its sampler is ODE-only,
mdqm9/sample_ambient.py).

Writes `initial_samples_sde_*.npy` / `samples_sde_*.npy` (no dlogps: the
SDE carries no likelihood — use the ODE sampler, mdqm9_sample_ambient.py,
for reweighting work). Marginal qualification: on the trained production
oracle g <= 0.1 holds the ODE route's KS floor; g >= 0.2 would need a
score model the reference does not train (BASELINE.md SDE rows).

Config keys (all also CLI flags): `sde_g` (noise scale), `n_steps`,
`compute_dtype` (bf16_agg is the scanned sweet spot at 4096 chains),
`sde_forward_impl` ("dense" | "pair_kernel" — the fused pair-layer
Pallas kernel, f32 only).
"""
import os
import sys

sys.path.insert(0, ".")

import numpy as np

from scripts.mdqm9_train_ambient import parse


def main(argv):
    import jax
    import jax.numpy as jnp

    from ti_tpu.data.mdqm9 import MDQM9AmbientDataset
    from ti_tpu.sampling.drivers import _compute_dtype, sample_molecular_sde
    from ti_tpu.train.ambient import build_ambient_model
    from ti_tpu.train.common import load_checkpoint

    import dataclasses

    cfg = parse(argv)
    # "_sde" artifact suffix BEFORE shard_config so the fan-out shard token
    # lands last (merge_shards matches *_shard0of{K}* families)
    cfg = dataclasses.replace(cfg, data_save_name=f"{cfg.data_save_name}_sde")
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
    x0 = ds.frames

    if cfg.num_shards > 1:  # multi-host fan-out (parallel/fanout.py)
        from ti_tpu.parallel.fanout import shard_config, shard_slice

        lo, hi = shard_slice(len(x0), cfg.shard, cfg.num_shards)
        x0 = x0[lo:hi]
        cfg = shard_config(cfg, cfg.shard, cfg.num_shards)

    temps = np.tile(
        np.array([float(cfg.sampling_T0), float(cfg.sampling_T1)], np.float32),
        (len(x0), 1),
    )
    impl = getattr(cfg, "sde_forward_impl", "dense")
    out = sample_molecular_sde(
        model, ck["params"], ds.template,
        jnp.asarray(x0, jnp.float32), jnp.asarray(temps),
        jax.random.PRNGKey(cfg.seed), g_fn=cfg.sde_g, n_steps=cfg.n_steps,
        compute_dtype=None if impl == "pair_kernel" else _compute_dtype(cfg),
        forward_impl=impl,
    )
    samples = np.asarray(out)  # (C, n_save, N, 3)

    # same artifact family/location as the ODE sampler (_save_ambient),
    # "_sde" suffix; no dlogps by construction
    os.makedirs(cfg.data_save_path, exist_ok=True)
    name = cfg.data_save_name
    np.save(os.path.join(cfg.data_save_path, f"initial_samples_{name}.npy"),
            np.asarray(x0))
    np.save(os.path.join(cfg.data_save_path, f"samples_{name}.npy"), samples)
    print(
        f"sde-sampled {len(samples)} conformations "
        f"(g={cfg.sde_g}, {cfg.n_steps} steps, impl={impl}) -> "
        f"{cfg.data_save_path}/samples_{name}.npy"
    )


if __name__ == "__main__":
    main(sys.argv[1:])
