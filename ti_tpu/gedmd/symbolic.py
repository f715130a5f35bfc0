"""Symbolic dictionary evaluation for gEDMD (reference gedmd/util.py:128-224).

The reference's ``Sym2numeric`` lambdifies every basis function AND every
symbolic 1st/2nd derivative separately (n + n*d + n*d*d lambdified
callables, evaluated in python loops). The TPU-native redesign keeps sympy
only as the *input format*: each expression is lambdified once with the
jax printer, and derivatives come from **forward-mode autodiff**
(jax.jacfwd), so the whole basis, its gradient, and its Hessian are each
ONE jitted, vmapped program — no symbolic differentiation, no per-function
python loops at evaluation time.

API parity: ``SymbolicBasis(psi_list, var_list)(x)``, ``.diff(x)``,
``.ddiff(x)`` with the reference's shapes ((n, m), (n, d, m),
(n, d, d, m) for x of shape (d, m)). ``ndiff`` is accepted for drop-in
compatibility but unnecessary — autodiff provides any order on demand.

Note: the reference never calls Sym2numeric from any pipeline (dead code,
PARITY.md); it is provided for users of the original API.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp


class SymbolicBasis:
    """Evaluate a sympy-defined basis set and its derivatives on device."""

    def __init__(self, psi_list: Sequence, var_list: Sequence, ndiff: int = 2):
        import sympy

        self.psi = list(psi_list)
        self.var = list(var_list)
        self.n = len(self.psi)
        self.d = len(self.var)
        self.ndiff = ndiff

        fns = [
            sympy.lambdify(self.var, p, modules=[{"numpy": jnp}, jnp])
            for p in self.psi
        ]

        def eval_point(xp):  # (d,) -> (n,)
            vals = [jnp.asarray(f(*xp), dtype=xp.dtype) for f in fns]
            # constant expressions lambdify to scalars independent of x:
            # broadcast them so stack/jacfwd see uniform shapes
            return jnp.stack([jnp.broadcast_to(v, ()) for v in vals])

        # x arrives as (d, m); vmap over the trailing sample axis
        self._eval = jax.jit(jax.vmap(eval_point, in_axes=1, out_axes=1))
        self._grad = jax.jit(jax.vmap(jax.jacfwd(eval_point), in_axes=1, out_axes=2))
        self._hess = jax.jit(
            jax.vmap(jax.jacfwd(jax.jacfwd(eval_point)), in_axes=1, out_axes=3)
        )

    def __call__(self, x) -> np.ndarray:
        """(d, m) -> (n, m) basis values."""
        return np.asarray(self._eval(jnp.asarray(x)))

    def diff(self, x) -> np.ndarray:
        """(d, m) -> (n, d, m) gradients."""
        return np.asarray(self._grad(jnp.asarray(x)))

    def ddiff(self, x) -> np.ndarray:
        """(d, m) -> (n, d, d, m) Hessians."""
        return np.asarray(self._hess(jnp.asarray(x)))


# reference-compatible alias (gedmd/util.py:128)
Sym2numeric = SymbolicBasis
