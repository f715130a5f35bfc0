"""Embedding blocks shared by the velocity-field networks.

TPU-native (flax) counterparts of the reference embedding layer zoo
(mdqm9/thermo/ambient/models/embedding.py). The reference mutates PyG batch
attributes and concatenates invariant features on the batch object
(embedding.py:68-86); here everything is a pure function/module returning
arrays, and feature accumulation is an explicit concat at the call site.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def positional_encoding(x: Array, dim: int, max_length: float) -> Array:
    """Sin/cos positional encoding of a scalar feature array.

    Matches reference PositionalEncoder.forward
    (mdqm9/thermo/ambient/models/embedding.py:107-161): for ranks
    r = 1..dim/2, emits (cos(x·rπ/L), sin(x·rπ/L)) interleaved per rank,
    giving shape (*x.shape, dim).
    """
    assert dim % 2 == 0, "dim must be even for sin/cos positional encoding"
    ranks = jnp.arange(1, dim // 2 + 1, dtype=jnp.result_type(x, float))
    ang = (jnp.asarray(x)[..., None] / max_length) * ranks * jnp.pi  # (..., R)
    # interleave as [cos_1, sin_1, cos_2, sin_2, ...] like the reference's
    # per-rank stack((cos, sin), axis=1) + concat
    enc = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)  # (..., R, 2)
    return jnp.reshape(enc, (*jnp.shape(x), dim))


def temperature_encoding(
    T: Array, dim: int, max_length: float, temperatures: Sequence[float]
) -> Array:
    """Center-by-known-temps, scale-by-range, then positionally encode.

    Exactly the reference TemperatureEncoder normalization
    (mdqm9/thermo/ambient/models/embedding.py:200-212): centering uses the
    *mean of the temperatures known at train time* and scaling uses their
    range — this is what makes leave-one-temperature-out extrapolation work,
    so it must not be changed to per-batch statistics.
    """
    temps = jnp.asarray(temperatures, dtype=jnp.result_type(T, float))
    x = (jnp.asarray(T) - jnp.mean(temps)) / (jnp.max(temps) - jnp.min(temps))
    return positional_encoding(x, dim, max_length)


class MLP(nn.Module):
    """Linear-LayerNorm-SiLU ×2 → Linear (reference embedding.MLP:9-49).

    ``dtype`` sets the compute/activation dtype (params stay f32): pass
    jnp.bfloat16 for the memory-bandwidth-bound sampling path.
    """

    f_hidden: int
    f_out: int
    skip: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Dense(self.f_hidden, dtype=self.dtype)(x)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Dense(self.f_hidden, dtype=self.dtype)(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Dense(self.f_out, dtype=self.dtype)(h)
        if self.skip:
            return x[..., : self.f_out] + h
        return h
