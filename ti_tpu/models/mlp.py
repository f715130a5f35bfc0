"""ADW velocity-field MLP.

Flax counterpart of the reference FCNetMultiBeta
(adw/thermo/models/simple.py:5-41): an MLP over [x_t, t, beta_embed] where
beta_embed is a small MLP over [beta0, beta1, t]. The reference forward also
accepts (and ignores) x0s (simple.py:38); we drop that dead argument.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class FCNetMultiBeta(nn.Module):
    """b(x_t, t, beta0, beta1) -> velocity, all args shaped (..., dim)/(..., 1)."""

    in_size: int = 1
    out_size: int = 1
    hidden_size: int = 256
    num_layers: int = 5

    @nn.compact
    def __call__(self, xt: Array, t: Array, beta0: Array, beta1: Array) -> Array:
        h = jnp.concatenate([beta0, beta1, t], axis=-1)
        h = nn.Dense(self.hidden_size, name="beta_embed_0")(h)
        h = nn.silu(h)
        h = nn.Dense(self.hidden_size, name="beta_embed_1")(h)
        h = nn.silu(h)
        beta_embed = nn.Dense(1, name="beta_embed_2")(h)

        z = jnp.concatenate([xt, t, beta_embed], axis=-1)
        for i in range(self.num_layers):
            z = nn.Dense(self.hidden_size, name=f"dense_{i}")(z)
            z = nn.silu(z)
        return nn.Dense(self.out_size, name="dense_out")(z)
