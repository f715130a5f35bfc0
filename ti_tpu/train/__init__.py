from ti_tpu.train.common import (
    ReduceLROnPlateau,
    TrainState,
    make_optimizer,
    save_checkpoint,
    load_checkpoint,
)
from ti_tpu.train.adw import train_adw
from ti_tpu.train.ambient import train_ambient
from ti_tpu.train.latent import train_latent

__all__ = [
    "ReduceLROnPlateau",
    "TrainState",
    "make_optimizer",
    "save_checkpoint",
    "load_checkpoint",
    "train_adw",
    "train_ambient",
    "train_latent",
]
