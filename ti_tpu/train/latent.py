"""MDQM9 latent (noise→data Boltzmann generator) training loop
(reference mdqm9/train_latent.py), TPU-native.

One dataset, one-sided interpolant/loss (OneSidedVelocityLoss,
mdqm9/thermo/latent/losses.py:114-121), single-T or multi-T conditioning
(latent/models/cpainn.py:43-72), Kabsch-aligned noise (mdqm9_latent.py:
100-105), same optimizer/scheduler skeleton as the ambient trainer minus
the epoch-best tracking (the reference latent trainer has none)."""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ti_tpu import interpolants
from ti_tpu.config import MDQM9Config, clone_config
from ti_tpu.data.mdqm9 import MDQM9LatentDataset
from ti_tpu.losses import molecular_velocity_loss
from ti_tpu.models.cpainn import CPaiNN
from ti_tpu.train import common
from ti_tpu.utils.logging import MetricLogger


def build_latent_model(cfg: MDQM9Config) -> CPaiNN:
    multi_t = len(cfg.T) > 1
    kwargs = {}
    if multi_t:
        # the latent model centers/scales by the temperatures it was
        # trained on (latent/models/cpainn.py:47-52)
        kwargs["temperatures"] = tuple(float(t) for t in cfg.T)
    return CPaiNN(
        n_features=cfg.n_features,
        score_layers=cfg.score_layers,
        temp_length=cfg.temp_length,
        conditioning="latent" if multi_t else "none",
        # same sentinel rule as build_ambient_model (reference latent
        # AddGraph(cutoff), thermo/latent/models/graph.py:127-140)
        cutoff=None if cfg.cutoff >= 1000.0 else float(cfg.cutoff),
        **kwargs,
    )


def train_latent(
    cfg: MDQM9Config,
    dataset: Optional[MDQM9LatentDataset] = None,
    logger: Optional[MetricLogger] = None,
) -> Dict:
    key = jax.random.PRNGKey(cfg.seed)
    logger = logger or MetricLogger(cfg.use_wandb, cfg.project_name, cfg.model_save_name)

    if dataset is None:
        dataset = MDQM9LatentDataset.load(
            cfg.traj_path, cfg.sdf_path, cfg.mdqm9_traj_filename, cfg.sdf_filename,
            split="train", Ts=cfg.T, scale=cfg.scale_trajs, align=cfg.align,
        )

    template = dataset.template
    model = build_latent_model(cfg)
    interp = interpolants.one_sided_linear()

    key, init_key = jax.random.split(key)
    params = model.init(init_key, template)

    batched_apply = common.make_batched_apply(cfg, model, template)

    def loss_fn(p, k, x0, x1, temps):
        return molecular_velocity_loss(
            model.apply, p, k, template, x0, x1, temps, interp,
            t_distr=cfg.t_distr, remat=getattr(cfg, "loss_remat", False),
            batched_apply_fn=batched_apply,
        )

    tx = common.make_optimizer(weight_decay=cfg.weight_decay, clip=1.0)
    state = common.init_train_state(params, tx, cfg.learning_rate)
    update = common.make_update_step(
        loss_fn, tx, accum_steps=getattr(cfg, "grad_accum", 1) or 1
    )

    n_temp_cond = template.temps.shape[0]

    # donate the carried TrainState: params/opt-state buffers are rebound by
    # the caller every epoch, so XLA reuses them in place instead of
    # allocating a second copy (HBM headroom; same-schedule perf)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_epoch(state, key, x0s, x1s, temps):
        def body(carry, batch):
            st, k = carry
            k, sub = jax.random.split(k)
            st, loss = update(st, sub, *batch)
            return (st, k), loss

        (state, _), losses = jax.lax.scan(body, (state, key), (x0s, x1s, temps))
        return state, jnp.mean(losses)

    @jax.jit
    def eval_epoch(params, key, x0s, x1s, temps):
        def body(k, batch):
            k, sub = jax.random.split(k)
            return k, loss_fn(params, sub, *batch)

        _, losses = jax.lax.scan(body, key, (x0s, x1s, temps))
        return jnp.mean(losses)

    scheduler = common.ReduceLROnPlateau(factor=0.5, patience=10)
    history = {"train_loss": [], "last_train_loss": []}

    save_dir = os.path.join(cfg.model_save_path, cfg.model_save_name)
    os.makedirs(save_dir, exist_ok=True)
    clone_config(cfg, cfg.model_save_path, cfg.model_save_name)

    for epoch in range(cfg.n_epochs):
        key, kd, ktr, kev = jax.random.split(key, 4)
        x0s, x1s, T = dataset.epoch_batches(kd, cfg.batch_size)
        temps = T[..., None][..., :n_temp_cond]  # (nb, B, 0 or 1)

        state, train_loss = train_epoch(state, ktr, x0s, x1s, temps)
        last_train_loss = eval_epoch(state.params, kev, x0s, x1s, temps)

        new_lr = scheduler.step(float(train_loss), float(state.lr))
        state = state._replace(lr=jnp.asarray(new_lr, jnp.float32))

        history["train_loss"].append(float(train_loss))
        history["last_train_loss"].append(float(last_train_loss))
        logger.log(
            {"train_loss": float(train_loss), "last_model_train_loss": float(last_train_loss),
             "lr": new_lr, "nan_steps": int(state.nan_count)},
            step=epoch,
        )
        common.save_checkpoint(
            os.path.join(save_dir, f"{cfg.model_save_name}_{epoch}"), {"params": state.params}
        )

    logger.finish()
    return {
        "params": state.params,
        "model": model,
        "template": template,
        "history": history,
        "state": state,
    }
