"""Closed-form Kabsch alignment in JAX.

Replaces the reference's host-side ``scipy.spatial.transform.Rotation.
align_vectors`` call in the latent data pipeline
(mdqm9/data/mdqm9_latent.py:103-105) with a jittable/vmappable SVD-based
solve so alignment can run on-device inside the data pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def kabsch_align(x: Array, target: Array) -> Array:
    """Rotate ``x`` (N,3) onto ``target`` (N,3); returns R @ x rows.

    Proper rotation (det +1), least-squares optimal (Kabsch). Matches
    scipy ``Rotation.align_vectors(a=target, b=x)[0].apply(x)``.
    Inputs are assumed centered (the callers remove COM first, as the
    reference does at mdqm9/data/mdqm9_latent.py:100-104).
    """
    h = x.T @ target  # (3, 3) covariance
    u, _, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
    s = jnp.diag(jnp.array([1.0, 1.0, 1.0]).at[2].set(d))
    r = vt.T @ s @ u.T
    return x @ r.T
