"""ADW training loop (reference adw/train.py:18-110), TPU-native.

Structural differences from the reference:
- the whole epoch runs as ONE ``lax.scan`` over stacked batches (a single
  device dispatch per epoch) instead of a python batch loop with per-batch
  host->device copies (adw/train.py:46-76).
- validation is a scanned pure loss pass; ReduceLROnPlateau steps on the
  val loss exactly like the reference (adw/train.py:85-86).
- per-epoch orbax checkpoints replace pickled whole-module torch.save
  (adw/train.py:97).
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ti_tpu import interpolants
from ti_tpu.config import ADWConfig, clone_config
from ti_tpu.data.adw import ADWDataset
from ti_tpu.losses import adw_velocity_loss
from ti_tpu.models.mlp import FCNetMultiBeta
from ti_tpu.train import common
from ti_tpu.utils.logging import MetricLogger


def _adw_dtype(cfg: ADWConfig):
    """Resolve ADWConfig.dtype, enabling x64 for the f64 parity mode."""
    if cfg.dtype in ("f64", "float64"):
        jax.config.update("jax_enable_x64", True)
        return jnp.float64
    if cfg.dtype not in ("f32", "float32"):
        raise ValueError(f"ADWConfig.dtype must be f32 or f64, got {cfg.dtype!r}")
    return jnp.float32


def train_adw(
    cfg: ADWConfig,
    base_data: Optional[ADWDataset] = None,
    target_data: Optional[ADWDataset] = None,
    logger: Optional[MetricLogger] = None,
) -> Dict:
    """Train the ADW velocity field; returns {params, model, history}."""
    key = jax.random.PRNGKey(cfg.seed)
    logger = logger or MetricLogger(cfg.use_wandb, cfg.project_name, cfg.model_save_name)

    csv = os.path.join(cfg.traj_path, cfg.traj_filename)
    if base_data is None:
        base_data = ADWDataset.from_csv(csv, cfg.beta0s, cfg.n_samples, seed=cfg.seed)
    if target_data is None:
        target_data = ADWDataset.from_csv(csv, cfg.beta1s, cfg.n_samples, seed=cfg.seed)

    train0, val0, _ = base_data.splits()
    train1, val1, _ = target_data.splits()

    # f64 parity mode (reference adw/train.py:29; ADWConfig.dtype docstring:
    # CPU-only — enable x64 BEFORE any array in the training graph exists)
    dt = _adw_dtype(cfg)

    model = FCNetMultiBeta(
        in_size=1, out_size=1, hidden_size=cfg.hidden_size,
        num_layers=cfg.num_layers, param_dtype=dt,
    )
    interp = interpolants.linear(a=cfg.a, gamma=cfg.gamma)

    key, init_key = jax.random.split(key)
    z = jnp.zeros((1, 1), dt)
    params = model.init(init_key, z, z, z, z)

    def apply_fn(p, xt, t, b0, b1):
        return model.apply(p, xt, t, b0, b1)

    def loss_fn(p, k, x0, x1, b0, b1):
        return adw_velocity_loss(apply_fn, p, k, x0, x1, b0, b1, interp)

    tx = common.make_optimizer(weight_decay=cfg.wd, clip=1.0)
    state = common.init_train_state(params, tx, cfg.lr)
    update = common.make_update_step(loss_fn, tx)

    # donate the carried TrainState: params/opt-state buffers are rebound by
    # the caller every epoch, so XLA reuses them in place instead of
    # allocating a second copy (HBM headroom; same-schedule perf)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_epoch(state, key, x0s, x1s, b0s, b1s):
        def body(carry, batch):
            st, k = carry
            k, sub = jax.random.split(k)
            st, loss = update(st, sub, *batch)
            return (st, k), loss

        (state, _), losses = jax.lax.scan(body, (state, key), (x0s, x1s, b0s, b1s))
        return state, jnp.mean(losses)

    @jax.jit
    def eval_epoch(params, key, x0s, x1s, b0s, b1s):
        def body(k, batch):
            k, sub = jax.random.split(k)
            return k, loss_fn(params, sub, *batch)

        _, losses = jax.lax.scan(body, key, (x0s, x1s, b0s, b1s))
        return jnp.mean(losses)

    scheduler = common.ReduceLROnPlateau(factor=0.5, patience=10)
    history = {"train_loss": [], "val_loss": []}

    save_dir = os.path.join(cfg.model_save_path, cfg.model_save_name)
    os.makedirs(save_dir, exist_ok=True)
    clone_config(cfg, cfg.model_save_path, cfg.model_save_name)

    for epoch in range(cfg.epochs):
        key, k0, k1, ktr, kval = jax.random.split(key, 5)
        x0s, b0s = train0.epoch_batches(k0, cfg.batch_size)
        x1s, b1s = train1.epoch_batches(k1, cfg.batch_size)
        nb = min(len(x0s), len(x1s))
        state, train_loss = train_epoch(
            state, ktr,
            *(jnp.asarray(a[:nb], dt) for a in (x0s, x1s, b0s, b1s)),
        )

        vx0, vb0 = val0.epoch_batches(k0, cfg.batch_size)
        vx1, vb1 = val1.epoch_batches(k1, cfg.batch_size)
        nv = min(len(vx0), len(vx1))
        val_loss = eval_epoch(
            state.params, kval,
            *(jnp.asarray(a[:nv], dt) for a in (vx0, vx1, vb0, vb1)),
        )

        new_lr = scheduler.step(float(val_loss), float(state.lr))
        state = state._replace(lr=jnp.asarray(new_lr, jnp.float32))

        history["train_loss"].append(float(train_loss))
        history["val_loss"].append(float(val_loss))
        logger.log(
            {"train_loss": float(train_loss), "val_loss": float(val_loss),
             "lr": new_lr, "nan_steps": int(state.nan_count)},
            step=epoch,
        )
        common.save_checkpoint(
            os.path.join(save_dir, f"epoch_{epoch}"), {"params": state.params}
        )

    logger.finish()
    return {"params": state.params, "model": model, "history": history, "state": state}
