"""Stochastic-interpolant schedules as pure functions.

TPU-native re-design of the reference interpolant classes
(reference: adw/thermo/interpolants.py:5-110,
mdqm9/thermo/ambient/interpolants.py:53-108,
mdqm9/thermo/latent/interpolants.py:42-75). The reference builds
``nn.Module`` objects holding lambdas and drawing ``torch.randn`` inside
methods; here an interpolant is an immutable pytree-free dataclass of jittable
scalar functions of ``t``, and all randomness enters through explicit
``jax.random`` keys so everything composes with ``jit``/``vmap``/``scan``.

Conventions (matching the reference):
    It(t, x0, x1)    = alpha(t) * x0 + beta(t) * x1
    dtIt(t, x0, x1)  = alpha_dot(t) * x0 + beta_dot(t) * x1
    x_t^±            = It ± gamma(t) * z,   z ~ N(0, I)   (two-sided)
    x_t^±            = beta(t) x1 ± alpha(t) x0           (one-sided, x0 = noise)

gamma schedules (mdqm9/thermo/ambient/interpolants.py:70-92):
    brownian: gamma(t) = sqrt(a t (1-t))
    sin2:     gamma(t) = sin^2(pi t)
    sig_sum:  scaled sigmoid-sum bump

Note: the reference ADW ``OneSidedLinearInterpolant.calc_antithetic_xts`` has
an apparent typo (``It_m = b*x1 - a*x1``, adw/thermo/interpolants.py:74); the
latent copy (mdqm9/thermo/latent/interpolants.py:72-75) is correct and is what
we implement.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
ScalarFn = Callable[[Array], Array]


def _bcast(t: Array, x: Array) -> Array:
    """Broadcast a scalar/per-sample t against state x (append axes)."""
    t = jnp.asarray(t)
    while t.ndim < jnp.ndim(x):
        t = t[..., None]
    return t


@dataclasses.dataclass(frozen=True)
class Interpolant:
    """A two-time-marginal stochastic interpolant.

    All fields are scalar functions of time ``t in [0, 1]`` (they broadcast
    over arrays of t). ``one_sided`` selects the antithetic construction used
    by the latent (Boltzmann-generator) pipeline, where x0 itself is the
    noise and there is no extra gamma*z term.
    """

    alpha: ScalarFn
    alpha_dot: ScalarFn
    beta: ScalarFn
    beta_dot: ScalarFn
    gamma: ScalarFn
    gamma_dot: ScalarFn
    gg_dot: ScalarFn
    one_sided: bool = False
    name: str = "interpolant"

    def It(self, t: Array, x0: Array, x1: Array) -> Array:
        t0, t1 = _bcast(t, x0), _bcast(t, x1)
        return self.alpha(t0) * x0 + self.beta(t1) * x1

    def dtIt(self, t: Array, x0: Array, x1: Array) -> Array:
        t0, t1 = _bcast(t, x0), _bcast(t, x1)
        return self.alpha_dot(t0) * x0 + self.beta_dot(t1) * x1

    def antithetic_xts(
        self, key: Array, t: Array, x0: Array, x1: Array
    ) -> Tuple[Array, Array, Array]:
        """(x_t^+, x_t^-, z) for the antithetic variance-reduced loss.

        Two-sided (reference BaseInterpolant.calc_antithetic_xts):
            x_t^± = It(t) ± gamma(t) z with fresh z ~ N(0, I).
        One-sided (latent, x0 is the Gaussian noise; reference
        mdqm9/thermo/latent/interpolants.py:72-75): z := x0 and
            x_t^± = beta(t) x1 ± alpha(t) x0.
        """
        tb = _bcast(t, x0)
        if self.one_sided:
            plus = self.beta(tb) * x1 + self.alpha(tb) * x0
            minus = self.beta(tb) * x1 - self.alpha(tb) * x0
            return plus, minus, x0
        z = jax.random.normal(key, jnp.shape(x0), dtype=jnp.result_type(x0))
        g = self.gamma(tb)
        it = self.It(t, x0, x1)
        return it + g * z, it - g * z, z

    def regular_xt(self, key: Array, t: Array, x0: Array, x1: Array) -> Tuple[Array, Array]:
        """(x_t, z): single noisy interpolant draw (reference calc_regular_xt)."""
        if self.one_sided:
            return self.It(t, x0, x1), x0
        z = jax.random.normal(key, jnp.shape(x0), dtype=jnp.result_type(x0))
        tb = _bcast(t, x0)
        return self.It(t, x0, x1) + self.gamma(tb) * z, z


def _zero(t: Array) -> Array:
    return jnp.zeros_like(jnp.asarray(t, dtype=jnp.result_type(float)))


def _gamma_brownian(a: float):
    a = float(a)

    def gamma(t):
        return jnp.sqrt(a * t * (1.0 - t))

    def gamma_dot(t):
        # a(1-2t) / (2 sqrt(a t (1-t))); singular at t in {0,1} like the reference
        return a * (1.0 - 2.0 * t) / (2.0 * jnp.sqrt(a * t * (1.0 - t)))

    def gg_dot(t):
        return (a / 2.0) * (1.0 - 2.0 * t)

    return gamma, gamma_dot, gg_dot


def _gamma_sin2():
    pi = jnp.pi

    def gamma(t):
        return jnp.sin(pi * t) ** 2

    def gamma_dot(t):
        return 2.0 * pi * jnp.sin(pi * t) * jnp.cos(pi * t)

    def gg_dot(t):
        return gamma(t) * gamma_dot(t)

    return gamma, gamma_dot, gg_dot


def _gamma_sig_sum(a: float):
    a = float(a)
    scale = 2.2

    def sig(u):
        return jax.nn.sigmoid(u)

    def gamma(t):
        return scale * (
            sig(a * (t - 0.5) + 1.0)
            - sig(a * (t - 0.5) - 1.0)
            - sig(-a / 2.0 + 1.0)
            + sig(-a / 2.0 - 1.0)
        )

    def gamma_dot(t):
        sm = sig(-1.0 + a * (t - 0.5))
        sp = sig(1.0 + a * (t - 0.5))
        return scale * ((-a) * (1.0 - sm) * sm + a * (1.0 - sp) * sp)

    def gg_dot(t):
        return gamma(t) * gamma_dot(t)

    return gamma, gamma_dot, gg_dot


_GAMMAS = {"brownian": _gamma_brownian, "sin2": _gamma_sin2, "sig_sum": _gamma_sig_sum}


def linear(a: float = 1.0, gamma: str = "brownian") -> Interpolant:
    """Two-sided linear interpolant It = (1-t) x0 + t x1 with a gamma schedule.

    ``gamma`` in {"brownian", "sin2", "sig_sum"}; ``a`` parameterizes
    brownian/sig_sum (ignored by sin2), matching the reference
    (mdqm9/thermo/ambient/interpolants.py:53-108).
    """
    if gamma not in _GAMMAS:
        raise ValueError(f"unknown gamma schedule {gamma!r}; want one of {sorted(_GAMMAS)}")
    maker = _GAMMAS[gamma]
    g, gd, ggd = maker(a) if gamma != "sin2" else maker()
    return Interpolant(
        alpha=lambda t: 1.0 - t,
        alpha_dot=lambda t: jnp.full_like(jnp.asarray(t, dtype=jnp.result_type(float)), -1.0),
        beta=lambda t: jnp.asarray(t, dtype=jnp.result_type(float)),
        beta_dot=lambda t: jnp.ones_like(jnp.asarray(t, dtype=jnp.result_type(float))),
        gamma=g,
        gamma_dot=gd,
        gg_dot=ggd,
        one_sided=False,
        name=f"linear/{gamma}",
    )


def one_sided_linear() -> Interpolant:
    """One-sided linear interpolant It = (1-t) x0 + t x1 with x0 ~ N(0, I).

    Used by the latent (noise -> data) pipeline; the antithetic pair reflects
    the noise x0 itself (mdqm9/thermo/latent/interpolants.py:42-75). gamma is
    identically zero (the noise lives in alpha(t) x0).
    """
    return Interpolant(
        alpha=lambda t: 1.0 - t,
        alpha_dot=lambda t: jnp.full_like(jnp.asarray(t, dtype=jnp.result_type(float)), -1.0),
        beta=lambda t: jnp.asarray(t, dtype=jnp.result_type(float)),
        beta_dot=lambda t: jnp.ones_like(jnp.asarray(t, dtype=jnp.result_type(float))),
        gamma=_zero,
        gamma_dot=_zero,
        gg_dot=_zero,
        one_sided=True,
        name="one_sided_linear",
    )


def make_interpolant(kind: str = "linear", a: float = 1.0, gamma: str = "brownian") -> Interpolant:
    """Config-string constructor used by the training loops."""
    if kind == "linear":
        return linear(a=a, gamma=gamma)
    if kind in ("one_sided", "one_sided_linear"):
        return one_sided_linear()
    raise ValueError(f"unknown interpolant kind {kind!r}")
