"""Internal coordinates: z-matrix construction and NeRF reconstruction.

JAX rebuild of the reference z-matrix utilities
(mdqm9/analysis/utils/z_matrix.py, mdqm9/analysis/utils/mol_geometry.py —
themselves adapted from the public olsson-group/sma-md). The reference
loops over atoms in python per call; here construction is fully vectorized
and the sequential NeRF reconstruction is a ``lax.scan`` over the placement
order, vmapped over conformations, with the log|det J| accumulated in the
scan carry.

Conventions (kept identical):
- ref_atoms row i = (r_dist, r_angle, r_torsion): distance of atom i to
  r_dist, angle (i, r_dist, r_angle), torsion (i, r_dist, r_angle,
  r_torsion). Rows 0..2 are partially undefined (use -1 placeholders).
- torsions via atan2, range (-pi, pi] (mol_geometry.py:58-81).
- placement uses the (pi - angle) spherical convention of the reference
  ic_to_xyz (mol_geometry.py:114-165), so construct∘deconstruct is exactly
  identity.
- log|det J| counts the atom-2 (2x2) block plus one 3x3 block per placed
  atom (z_matrix.py:160-175, 196-221); atom 1's 1-D block is identity.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# geometry primitives (vectorized over any leading axes)
# ---------------------------------------------------------------------------

def compute_distance(x1: Array, x2: Array) -> Array:
    return jnp.linalg.norm(x2 - x1, axis=-1)


def compute_angle(x1: Array, x2: Array, x3: Array) -> Array:
    """Angle at x2 spanned by (x1, x2, x3), radians in [0, pi]."""
    u = x1 - x2
    v = x3 - x2
    cosang = jnp.sum(u * v, axis=-1) / (
        jnp.linalg.norm(u, axis=-1) * jnp.linalg.norm(v, axis=-1)
    )
    return jnp.arccos(jnp.clip(cosang, -1.0, 1.0))


def compute_torsion(x1: Array, x2: Array, x3: Array, x4: Array) -> Array:
    """Dihedral of the ordered quadruple, atan2 form, range (-pi, pi]."""
    b1 = x2 - x1
    b2 = x3 - x2
    b3 = x4 - x3
    c23 = jnp.cross(b2, b3)
    y = jnp.linalg.norm(b2, axis=-1) * jnp.sum(b1 * c23, axis=-1)
    x = jnp.sum(jnp.cross(b1, b2) * c23, axis=-1)
    return jnp.arctan2(y, x)


def ic_to_xyz(
    p1: Array, p2: Array, p3: Array, d: Array, ang: Array, tor: Array
) -> Tuple[Array, Array]:
    """Place an atom from internal coordinates relative to (p3, p2, p1).

    p3 is the distance reference, p2 the angle reference, p1 the torsion
    reference (reference mol_geometry.py:114-165). Returns (position,
    |det J| of the (d, ang, tor) -> local-xyz map) = d^2 sin(ang).
    """
    th = jnp.pi - ang
    d_local = jnp.stack(
        [d * jnp.cos(th), d * jnp.sin(th) * jnp.cos(tor), d * jnp.sin(th) * jnp.sin(tor)],
        axis=-1,
    )
    x23 = p3 - p2
    x23 = x23 / jnp.linalg.norm(x23, axis=-1, keepdims=True)
    x12 = p2 - p1
    n = jnp.cross(x12, x23)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    frame = jnp.stack([x23, jnp.cross(n, x23), n], axis=-1)  # columns
    pos = p3 + jnp.einsum("...ij,...j->...i", frame, d_local)
    det = d**2 * jnp.sin(th)  # analytic |det| of the reference J_det matrix
    return pos, jnp.abs(det)


# ---------------------------------------------------------------------------
# z-matrix construction (vectorized)
# ---------------------------------------------------------------------------

def _refs_array(ref_atoms) -> np.ndarray:
    """Normalize a ref_atoms list-of-triplets (None-padded) to (N, 3) int."""
    n = len(ref_atoms)
    out = np.zeros((n, 3), dtype=np.int32)
    for i, row in enumerate(ref_atoms):
        for j, v in enumerate(row):
            out[i, j] = -1 if v is None else int(v)
    return out


def construct_z_matrix(X: Array, ref_atoms, placing_order=None) -> Array:
    """Z-matrix (..., N-1, 3) from cartesians (..., N, 3).

    Column 0: distances (atoms 1..N-1 to ref0); column 1: angles (atoms
    2..); column 2: torsions (atoms 3..). Mirrors the reference slicing
    (z_matrix.py:56-102) but over arbitrary leading batch axes.
    """
    refs = _refs_array(ref_atoms)
    n = refs.shape[0]
    order = np.arange(n) if placing_order is None else np.asarray(placing_order)
    i3, i2, i1 = refs[:, 0], refs[:, 1], refs[:, 2]

    x4 = X[..., order, :]
    x3 = X[..., np.maximum(i3[1:], 0), :]
    x2 = X[..., np.maximum(i2[2:], 0), :]
    x1 = X[..., np.maximum(i1[3:], 0), :]

    dist = compute_distance(x4[..., 1:, :], x3)
    ang = compute_angle(x4[..., 2:, :], x3[..., 1:, :], x2)
    tor = compute_torsion(x1, x2[..., 1:, :], x3[..., 2:, :], x4[..., 3:, :])

    z = jnp.zeros(X.shape[:-2] + (n - 1, 3), dtype=X.dtype)
    z = z.at[..., :, 0].set(dist)
    z = z.at[..., 1:, 1].set(ang)
    z = z.at[..., 2:, 2].set(tor)
    return z


construct_z_matrix_batch = construct_z_matrix  # batched by broadcasting


# ---------------------------------------------------------------------------
# NeRF reconstruction with log|det J| (lax.scan)
# ---------------------------------------------------------------------------

def deconstruct_z_matrix(z: Array, ref_atoms, jacobian: bool = True):
    """Cartesians (N, 3) from one z-matrix (N-1, 3); vmap for batches.

    Atom 0 at the origin, atom 1 on +x, atom 2 in the xy-plane (reference
    z_matrix.py:186-211), then sequential NeRF placement. Returns
    (cartesian, logdetJ) or just cartesian if jacobian=False.
    """
    refs = _refs_array(ref_atoms)
    n = refs.shape[0]
    dtype = z.dtype

    # protection clamps (reference z_matrix.py:140-143)
    d_all = jnp.maximum(z[:, 0], 0.0)
    a_all = jnp.clip(z[:, 1], 0.0, jnp.pi)
    t_all = z[:, 2]

    cart = jnp.zeros((n, 3), dtype=dtype)
    cart = cart.at[1, 0].set(d_all[0])

    # atom 2 in the xy-plane, relative to its distance reference
    flip = bool(refs[2, 0])  # reference: `if ref_atoms[2][0]:`
    ang2 = jnp.pi - a_all[1] if flip else a_all[1]
    x_base = cart[refs[2, 0], 0]
    cart = cart.at[2, 0].set(x_base + d_all[1] * jnp.cos(ang2))
    cart = cart.at[2, 1].set(d_all[1] * jnp.sin(ang2))
    logdet = jnp.log(jnp.abs(d_all[1]) + 1e-300)  # |det| of the 2x2 block = d

    if n > 3:
        scan_refs = jnp.asarray(refs[3:], dtype=jnp.int32)
        scan_z = jnp.stack([d_all[2:], a_all[2:], t_all[2:]], axis=-1)
        scan_idx = jnp.arange(3, n, dtype=jnp.int32)

        def place(carry, inp):
            cart, logdet = carry
            i, r, zrow = inp
            p3 = cart[r[0]]
            p2 = cart[r[1]]
            p1 = cart[r[2]]
            pos, det = ic_to_xyz(p1, p2, p3, zrow[0], zrow[1], zrow[2])
            cart = cart.at[i].set(pos)
            return (cart, logdet + jnp.log(det + 1e-300)), None

        (cart, logdet), _ = jax.lax.scan(place, (cart, logdet), (scan_idx, scan_refs, scan_z))

    if jacobian:
        return cart, logdet
    return cart


def deconstruct_z_matrix_batch(z: Array, ref_atoms, jacobian: bool = True):
    """Batched NeRF reconstruction: z (B, N-1, 3) -> (B, N, 3)[, (B,)]."""
    if jacobian:
        return jax.vmap(lambda zz: deconstruct_z_matrix(zz, ref_atoms, True))(z)
    return jax.vmap(lambda zz: deconstruct_z_matrix(zz, ref_atoms, False))(z)


def compute_jacobian_batch(z: Array, ref_atoms) -> Array:
    """log|det J| only (reference z_matrix.py:245-297): 2x2 block + per-atom
    3x3 dets, closed form d^2 sin(angle)."""
    d = jnp.maximum(z[..., :, 0], 0.0)
    a = jnp.clip(z[..., :, 1], 0.0, jnp.pi)
    logdet = jnp.log(jnp.abs(d[..., 1]) + 1e-300)
    per_atom = jnp.log(d[..., 2:] ** 2 * jnp.sin(jnp.pi - a[..., 2:]) + 1e-300)
    return logdet + jnp.sum(per_atom, axis=-1)


def valid_z_mask(z: Array) -> Array:
    """Validity mask per conformation (reference correct_conf_indexes,
    z_matrix.py:300-310): d > 0, 0 <= angle <= pi, -pi < torsion <= pi."""
    ok_d = jnp.all(z[..., :, 0] > 0, axis=-1)
    ok_a = jnp.all((z[..., 1:, 1] >= 0) & (z[..., 1:, 1] <= jnp.pi), axis=-1)
    ok_t = jnp.all((z[..., 2:, 2] > -jnp.pi) & (z[..., 2:, 2] <= jnp.pi), axis=-1)
    return ok_d & ok_a & ok_t
