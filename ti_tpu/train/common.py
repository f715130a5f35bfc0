"""Shared training machinery: optimizer, plateau LR, NaN-guard, checkpoints.

Keeps the reference's training semantics (SURVEY.md §5.3-5.4) in a
TPU-native shape:

- Adam with L2 weight decay folded into the gradient BEFORE the moment
  estimates (torch.optim.Adam weight_decay semantics used at
  adw/train.py:42, mdqm9/train_ambient.py:96) — i.e. NOT decoupled AdamW.
- global-norm gradient clipping at 1.0 applied to the raw gradients
  (adw/train.py:68), before the decay term like torch's
  clip_grad_norm_ -> optim.step() ordering.
- the learning rate enters as a runtime scalar so ReduceLROnPlateau (same
  factor-0.5/patience-10 semantics as torch's scheduler, adw/train.py:43)
  never triggers recompilation.
- "safe backprop": a ``lax.cond`` skips the update when the loss is
  non-finite, counting the event (adw/train.py:59-65,
  mdqm9/train_ambient.py:136-142) — branchless on device instead of a
  python ``continue``.
- checkpoints via orbax (params, opt state, epoch, LR, RNG key) plus the
  config snapshot habit.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


def make_optimizer(weight_decay: float = 0.0, clip: float = 1.0) -> optax.GradientTransformation:
    """clip(1.0) -> +wd*θ -> Adam moments; LR is applied by the caller."""
    parts = []
    if clip is not None:
        parts.append(optax.clip_by_global_norm(clip))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam())
    return optax.chain(*parts)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    lr: Array  # scalar, runtime-adjustable
    nan_count: Array  # int32 running count of skipped steps


def init_train_state(params, tx: optax.GradientTransformation, lr: float) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        lr=jnp.asarray(lr, jnp.float32),
        nan_count=jnp.asarray(0, jnp.int32),
    )


def make_update_step(
    loss_fn: Callable[..., Array],
    tx: optax.GradientTransformation,
    accum_steps: int = 1,
) -> Callable:
    """Build a jittable (state, key, *batch) -> (state, loss) update with the
    NaN-guard built in. ``loss_fn(params, key, *batch) -> scalar``.

    ``accum_steps > 1`` splits the batch into that many microbatches and
    accumulates gradients in a ``lax.scan`` before ONE optimizer step —
    the batch-scale mechanism on a single chip: the two-forward antithetic
    loss OOMs the f32 compile above batch ~512, while accumulation keeps
    activation memory at the microbatch size with flat per-molecule cost
    (batch 1024/2048/4096 all ~1730-1750 mol/s vs 1700 at single-shot 256
    on v5e; BASELINE.md training row). Each microbatch gets its own folded
    key, so interpolation-time draws stay independent.
    """

    def step(state: TrainState, key: Array, *batch) -> Tuple[TrainState, Array]:
        if accum_steps == 1:
            loss, grads = jax.value_and_grad(loss_fn)(state.params, key, *batch)
        else:
            micro = tuple(
                a.reshape((accum_steps, a.shape[0] // accum_steps) + a.shape[1:])
                for a in batch
            )
            keys = jax.random.split(key, accum_steps)

            def one(carry, inp):
                gsum, lsum = carry
                k, *mb = inp
                l, g = jax.value_and_grad(loss_fn)(state.params, k, *mb)
                return (jax.tree.map(jnp.add, gsum, g), lsum + l), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss), _ = jax.lax.scan(one, (zeros, 0.0), (keys,) + micro)
            grads = jax.tree.map(lambda a: a / accum_steps, grads)
            loss = loss / accum_steps
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p - state.lr * u, state.params, updates)
        ok = jnp.isfinite(loss)
        params = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_params, state.params
        )
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_opt, state.opt_state
        )
        return (
            TrainState(params, opt_state, state.lr, state.nan_count + (~ok).astype(jnp.int32)),
            loss,
        )

    return step


def make_batched_apply(cfg, model, template):
    """Training-forward selector (config train_impl / train_compute_dtype).

    Returns ``None`` for the default "edge" impl (the loss vmaps
    ``model.apply`` per molecule), or a batched
    ``(params, x (B,N,3), t (B,), temps (B,K)) -> (B,N,3)`` closure over the
    dense (N x N) pair formulation — the sampling hot path — optionally in
    the bf16 / bf16_agg mixed-precision profiles (BASELINE.md).
    """
    impl = getattr(cfg, "train_impl", "edge")
    dtype_name = getattr(cfg, "train_compute_dtype", "f32")
    if impl == "edge":
        if dtype_name != "f32":
            raise ValueError(
                "train_compute_dtype != f32 requires train_impl='dense' "
                "(the edge impl has no mixed-precision profile)"
            )
        return None
    if impl != "dense":
        raise ValueError(f"unknown train_impl {impl!r} (use 'edge' or 'dense')")

    from ti_tpu.models.cpainn_dense import apply_dense

    cd = {"f32": None, "bf16": jnp.bfloat16, "bf16_agg": "bf16_agg"}
    if dtype_name not in cd:
        raise ValueError(f"unknown train_compute_dtype {dtype_name!r}")
    compute_dtype = cd[dtype_name]

    def batched_apply(params, x, t, temps):
        return apply_dense(
            model, params, x, t, temps, template.atom_ids, template.edges,
            compute_dtype=compute_dtype,
        )

    return batched_apply


@dataclasses.dataclass
class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau semantics (min mode,
    rel threshold): after ``patience`` epochs without a >threshold relative
    improvement, multiply LR by ``factor``."""

    factor: float = 0.5
    patience: int = 10
    threshold: float = 1e-4
    min_lr: float = 0.0
    best: float = float("inf")
    num_bad: int = 0

    def step(self, metric: float, lr: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = float(metric)
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            lr = max(lr * self.factor, self.min_lr)
            self.num_bad = 0
        return lr


# ---------------------------------------------------------------------------
# checkpointing (reference: per-epoch torch.save of module/state_dicts,
# adw/train.py:97, mdqm9/train_ambient.py:175-176 -> orbax here)
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, payload) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)


def load_checkpoint(path: str, like=None):
    """Restore an orbax checkpoint; survives cross-backend restores.

    A checkpoint saved on one backend and reopened on another (chip-saved
    oracle under JAX_PLATFORMS=cpu — the documented tunnel-stall pivot)
    fails the bare restore because the saved per-leaf shardings name
    unavailable devices ("sharding ... Got None"). With ``like`` the
    restore shardings come from the template; WITHOUT one, the fallback
    rebuilds restore args from the checkpoint's own metadata and restores
    arrays as host numpy (device placement happens on first use), so every
    call site survives a backend pivot without carrying a model template.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if like is not None:
        # item= alone only gives the tree structure; the per-leaf restore
        # shardings come from restore_args.
        restore_args = ocp.checkpoint_utils.construct_restore_args(like)
        return ckptr.restore(path, item=like, restore_args=restore_args)
    try:
        return ckptr.restore(path)
    except Exception as e:
        import sys

        print(
            f"[ti_tpu] bare checkpoint restore of {path} failed "
            f"({type(e).__name__}); retrying as a cross-backend numpy "
            f"restore",
            file=sys.stderr,
        )
        return _restore_cross_backend(ckptr, path)


def _restore_cross_backend(ckptr, path: str):
    """Device-agnostic restore: arrays come back as host numpy, scalars and
    strings keep their types. Restore args are built from the checkpoint's
    own metadata tree, so no model template is needed."""
    import jax
    import numpy as np
    import orbax.checkpoint as ocp
    from orbax.checkpoint.metadata import value as _vmeta

    meta_tree = ckptr.metadata(path).item_metadata.tree

    def to_args(m):
        if isinstance(m, _vmeta.ArrayMetadata) and not isinstance(
            m, _vmeta.ScalarMetadata
        ):
            return ocp.RestoreArgs(restore_type=np.ndarray)
        return ocp.RestoreArgs()

    return ckptr.restore(path, restore_args=jax.tree.map(to_args, meta_tree))
