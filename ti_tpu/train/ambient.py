"""MDQM9 ambient (T0→T1) training loop (reference mdqm9/train_ambient.py),
TPU-native.

Reference semantics kept:
- two datasets over the T0s and T1s temperature lists, independently
  shuffled each epoch so temperature pairs recombine
  (train_ambient.py:100-117);
- per-epoch-best parameter tracking by training-batch loss
  (train_ambient.py:133-134) — tracked inside the scan carry instead of a
  python deepcopy per improving batch;
- post-epoch re-evaluation of the train stream on the final model
  (train_ambient.py:153-159);
- NaN-guard, clip(1.0), Adam, ReduceLROnPlateau(0.5, 10);
- last + epoch-best checkpoints per epoch (train_ambient.py:175-176).

TPU-native: one ``lax.scan`` per epoch over stacked batches; loss vmaps the
GNN over molecules (losses.molecular_velocity_loss).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ti_tpu import interpolants
from ti_tpu.config import MDQM9Config, clone_config
from ti_tpu.data.mdqm9 import MDQM9AmbientDataset
from ti_tpu.losses import molecular_velocity_loss
from ti_tpu.models.cpainn import CPaiNN
from ti_tpu.train import common
from ti_tpu.utils.logging import MetricLogger


def build_ambient_model(cfg: MDQM9Config) -> CPaiNN:
    return CPaiNN(
        n_features=cfg.n_features,
        score_layers=cfg.score_layers,
        temp_length=cfg.temp_length,
        conditioning="ambient",
        # cutoff >= 1000 is the reference configs' complete-graph sentinel
        # (no QM9 molecule spans 1000 scaled units); finite values enable
        # per-eval distance masking (CPaiNN.cutoff docstring)
        cutoff=None if cfg.cutoff >= 1000.0 else float(cfg.cutoff),
    )


def train_ambient(
    cfg: MDQM9Config,
    dataset0: Optional[MDQM9AmbientDataset] = None,
    dataset1: Optional[MDQM9AmbientDataset] = None,
    logger: Optional[MetricLogger] = None,
    init_params=None,
) -> Dict:
    key = jax.random.PRNGKey(cfg.seed)
    logger = logger or MetricLogger(cfg.use_wandb, cfg.project_name, cfg.model_save_name)

    # resume (reference use_pretrained, mdqm9/train_ambient.py:40-44):
    # reload weights and offset the epoch counter
    min_epoch = 0
    if cfg.use_pretrained and init_params is None:
        ck = common.load_checkpoint(
            os.path.join(
                cfg.model_save_path, cfg.model_save_name,
                f"{cfg.model_save_name}_{cfg.model_epoch}_weights",
            )
        )
        init_params = ck["params"]
        try:
            min_epoch = int(str(cfg.model_epoch).removeprefix("best")) + 1
        except ValueError:
            min_epoch = 0

    if dataset0 is None:
        dataset0 = MDQM9AmbientDataset.load(
            cfg.traj_path, cfg.sdf_path, cfg.mdqm9_traj_filename, cfg.sdf_filename,
            split="train", Ts=cfg.T0s, scale=cfg.scale_trajs,
        )
    if dataset1 is None:
        dataset1 = MDQM9AmbientDataset.load(
            cfg.traj_path, cfg.sdf_path, cfg.mdqm9_traj_filename, cfg.sdf_filename,
            split="train", Ts=cfg.T1s, scale=cfg.scale_trajs,
        )

    template = dataset0.template
    model = build_ambient_model(cfg)
    interp = interpolants.linear(a=cfg.a, gamma=cfg.gamma)

    key, init_key = jax.random.split(key)
    if init_params is None:
        params = model.init(init_key, template)
    else:
        params = init_params

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

    # donate the carried TrainState: params/opt-state buffers are rebound by
    # the caller every epoch, so XLA reuses them in place instead of
    # allocating a second copy (HBM headroom; same-schedule perf)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_epoch(state, key, x0s, x1s, temps):
        """Scan all batches; carry epoch-best (loss, params)."""

        def body(carry, batch):
            st, k, best_loss, best_params = carry
            k, sub = jax.random.split(k)
            st, loss = update(st, sub, *batch)
            better = loss < best_loss
            best_loss = jnp.where(better, loss, best_loss)
            best_params = jax.tree.map(
                lambda bp, p: jnp.where(better, p, bp), best_params, st.params
            )
            return (st, k, best_loss, best_params), loss

        init = (state, key, jnp.asarray(jnp.inf), state.params)
        (state, _, best_loss, best_params), losses = jax.lax.scan(
            body, init, (x0s, x1s, temps)
        )
        return state, jnp.mean(losses), best_loss, best_params

    @jax.jit
    def eval_epoch(params, key, x0s, x1s, temps):
        def body(k, batch):
            k, sub = jax.random.split(k)
            return k, loss_fn(params, sub, *batch)

        _, losses = jax.lax.scan(body, key, (x0s, x1s, temps))
        return jnp.mean(losses)

    scheduler = common.ReduceLROnPlateau(factor=0.5, patience=10)
    history = {"train_loss": [], "last_train_loss": [], "epoch_best_loss": []}

    save_dir = os.path.join(cfg.model_save_path, cfg.model_save_name)
    os.makedirs(save_dir, exist_ok=True)
    clone_config(cfg, cfg.model_save_path, cfg.model_save_name)

    for epoch in range(min_epoch, min_epoch + cfg.n_epochs):
        key, k0, k1, ktr, kev = jax.random.split(key, 5)
        x0s, T0 = dataset0.epoch_batches(k0, cfg.batch_size)
        x1s, T1 = dataset1.epoch_batches(k1, cfg.batch_size)
        nb = min(len(x0s), len(x1s))
        temps = jnp.stack([T0[:nb], T1[:nb]], axis=-1)  # (nb, B, 2)

        state, train_loss, best_loss, best_params = train_epoch(
            state, ktr, x0s[:nb], x1s[:nb], temps
        )
        last_train_loss = eval_epoch(state.params, kev, x0s[:nb], x1s[:nb], temps)

        new_lr = scheduler.step(float(train_loss), float(state.lr))
        state = state._replace(lr=jnp.asarray(new_lr, jnp.float32))

        history["train_loss"].append(float(train_loss))
        history["last_train_loss"].append(float(last_train_loss))
        history["epoch_best_loss"].append(float(best_loss))
        logger.log(
            {
                "train_loss": float(train_loss),
                "last_model_train_loss": float(last_train_loss),
                "epoch_best_loss": float(best_loss),
                "lr": new_lr,
                "nan_steps": int(state.nan_count),
            },
            step=epoch,
        )
        common.save_checkpoint(
            os.path.join(save_dir, f"{cfg.model_save_name}_{epoch}_weights"),
            {"params": state.params},
        )
        common.save_checkpoint(
            os.path.join(save_dir, f"{cfg.model_save_name}_best{epoch}_weights"),
            {"params": best_params},
        )

    logger.finish()
    return {
        "params": state.params,
        "best_params": best_params,
        "model": model,
        "template": template,
        "history": history,
        "state": state,
    }
