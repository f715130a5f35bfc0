"""Optional Weights & Biases metric logging with a print fallback.

Mirrors the reference's ``use_wandb`` convention (adw/train.py:88-91,
mdqm9/train_ambient.py:166-169): wandb if requested and importable,
otherwise stdout. Also hosts a small jax.profiler trace helper — the
observability the reference lacked (SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, use_wandb: bool = False, project: str = "", name: str = ""):
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # noqa: PLC0415

                wandb.init(project=project, name=name)
                self._wandb = wandb
            except Exception as e:  # pragma: no cover - wandb not in image
                print(f"[MetricLogger] wandb unavailable ({e}); falling back to stdout")

    def log(self, metrics: Dict, step: Optional[int] = None) -> None:
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        else:
            parts = " ".join(
                f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}" for k, v in metrics.items()
            )
            print(f"[step {step}] {parts}" if step is not None else parts)

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace around a sampling/training region (SURVEY.md §5.1)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
