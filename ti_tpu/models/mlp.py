"""ADW velocity-field MLP.

Flax counterpart of the reference FCNetMultiBeta
(adw/thermo/models/simple.py:5-41): an MLP over [x_t, t, beta_embed] where
beta_embed is a small MLP over [beta0, beta1, t]. The reference forward also
accepts (and ignores) x0s (simple.py:38); we drop that dead argument.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class FCNetMultiBeta(nn.Module):
    """b(x_t, t, beta0, beta1) -> velocity, all args shaped (..., dim)/(..., 1).

    ``param_dtype=jnp.float64`` (with jax_enable_x64, CPU backends only —
    TPUs have no native f64) reproduces the reference's float64 ADW
    training (adw/train.py:29 sets torch default dtype float64); compute
    follows the promoted input/param dtype.
    """

    in_size: int = 1
    out_size: int = 1
    hidden_size: int = 256
    num_layers: int = 5
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xt: Array, t: Array, beta0: Array, beta1: Array) -> Array:
        pd = dict(param_dtype=self.param_dtype)
        h = jnp.concatenate([beta0, beta1, t], axis=-1)
        h = nn.Dense(self.hidden_size, name="beta_embed_0", **pd)(h)
        h = nn.silu(h)
        h = nn.Dense(self.hidden_size, name="beta_embed_1", **pd)(h)
        h = nn.silu(h)
        beta_embed = nn.Dense(1, name="beta_embed_2", **pd)(h)

        z = jnp.concatenate([xt, t, beta_embed], axis=-1)
        for i in range(self.num_layers):
            z = nn.Dense(self.hidden_size, name=f"dense_{i}", **pd)(z)
            z = nn.silu(z)
        return nn.Dense(self.out_size, name="dense_out", **pd)(z)
