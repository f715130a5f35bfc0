"""Parity tests for the pair-tangent kernel (ops/pair_tangent_kernel.py).

The K-lane forward-mode message kernel must reproduce jax.jvp of the dense
XLA forward (the path the divergence estimator currently linearizes), and
its orthogonal probe frame at K = 3N must reproduce the exact divergence
(ops.divergence.divergence_exact) — the estimator is EXACT there, so this
is an end-to-end correctness oracle, not a statistical check.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
from ti_tpu.models.cpainn import CPaiNN
from ti_tpu.models.cpainn_dense import dense_velocity_fn
from ti_tpu.ops.divergence import divergence_exact
from ti_tpu.ops.pair_tangent_kernel import (
    apply_dense_pair_tangent,
    pair_tangent_div_fn,
)

N_ATOMS = 5
F = 16
LAYERS = 2
B = 3


@pytest.fixture(scope="module")
def setup():
    mol = make_synthetic_molecule(n_atoms=N_ATOMS, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(
        n_features=F, score_layers=LAYERS, temp_length=100.0,
        conditioning="ambient",
    )
    params = model.init(jax.random.PRNGKey(0), template)
    key = jax.random.PRNGKey(7)
    x = 0.3 * jax.random.normal(key, (B, N_ATOMS, 3), jnp.float32)
    temps = jnp.tile(jnp.array([700.0, 300.0], jnp.float32), (B, 1))
    t = jnp.full((B,), 0.37, jnp.float32)
    return model, params, template, x, t, temps


@pytest.mark.parametrize("lane_block", [1, 2, 4])
def test_primal_and_jvp_parity_vs_dense(setup, lane_block):
    model, params, template, x, t, temps = setup
    k_lanes = 4
    z = jax.random.normal(jax.random.PRNGKey(3), (B, k_lanes, N_ATOMS, 3))

    vel, dvel = apply_dense_pair_tangent(
        model, params, x, t, temps, z, template.atom_ids, template.edges,
        interpret=True, lane_block=lane_block,
    )

    v_fn = dense_velocity_fn(model, params, template)
    vel_ref = v_fn(x, t, temps)
    np.testing.assert_allclose(
        np.asarray(vel), np.asarray(vel_ref), rtol=2e-4, atol=2e-5
    )

    for k in range(k_lanes):
        _, dv_ref = jax.jvp(
            lambda xs: v_fn(xs, t, temps), (x,), (z[:, k],)
        )
        np.testing.assert_allclose(
            np.asarray(dvel[:, k]), np.asarray(dv_ref), rtol=5e-4, atol=5e-5
        )


def test_orthogonal_full_frame_matches_exact_divergence(setup):
    model, params, template, x, t, temps = setup
    d = 3 * N_ATOMS
    div_fn = pair_tangent_div_fn(
        model, params, template, num_probes=d, probe_mode="orthogonal",
        interpret=True,
    )
    divs = div_fn(x, t[0], temps, jax.random.PRNGKey(11))

    v_fn = dense_velocity_fn(model, params, template)

    def one(xc, tc, cc):
        f = lambda y: v_fn(y[None], tc, cc[None])[0]
        return divergence_exact(f, xc)[1]

    ref = jnp.stack([one(x[i], t[i], temps[i]) for i in range(B)])
    np.testing.assert_allclose(
        np.asarray(divs), np.asarray(ref), rtol=2e-3, atol=2e-4
    )


def test_sampler_div_drift_matches_exact_dlogp(setup):
    """make_ode_sampler(div_drift=...) with the FULL orthogonal frame is an
    exact-divergence sampler — its dlogp must match the default exact path
    on the same trajectory (same gauss quadrature nodes)."""
    from ti_tpu.sampling.drivers import make_ode_sampler, molecular_v_fn_of

    model, params, template, x, t, temps = setup
    v_of = molecular_v_fn_of(model, params, template)
    kw = dict(
        solver="rk4", n_steps=4, n_save=2, return_dlogp=True,
        dlogp_quad_points=3, dlogp_quad="gauss", steps_per_dispatch=4,
    )
    ref = make_ode_sampler(v_of, divergence="exact", **kw)
    div_fn = pair_tangent_div_fn(
        model, params, template, num_probes=3 * N_ATOMS,
        probe_mode="orthogonal", interpret=True,
    )
    new = make_ode_sampler(v_of, div_drift=div_fn, **kw)

    key = jax.random.PRNGKey(2)
    sol_ref = ref(x, temps, key)
    sol_new = new(x, temps, key)
    np.testing.assert_allclose(
        np.asarray(sol_new.xs), np.asarray(sol_ref.xs), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sol_new.dlogp[:, -1]), np.asarray(sol_ref.dlogp[:, -1]),
        rtol=1e-3, atol=1e-3,
    )


def test_div_forward_impl_config_routing(setup):
    """cfg.div_forward_impl routes through drivers._div_drift_of with the
    documented guard rails (gauss path required; estimator must be
    exact/hutchinson)."""
    from ti_tpu.config import MDQM9Config
    from ti_tpu.sampling.drivers import _div_drift_of

    model, params, template, *_ = setup
    base = dict(
        divergence="hutchinson", num_probes=4, probe_mode="rademacher",
        dlogp_quad="gauss", dlogp_quad_points=3, steps_per_dispatch=4,
        return_dlogp=True,
    )
    assert _div_drift_of(
        MDQM9Config(**base), model, params, template
    ) is None  # default impl

    cfg = MDQM9Config(div_forward_impl="pair_tangent", **base)
    assert callable(_div_drift_of(cfg, model, params, template))

    cfg_exact = MDQM9Config(
        div_forward_impl="pair_tangent",
        **{**base, "divergence": "exact"},
    )
    assert callable(_div_drift_of(cfg_exact, model, params, template))

    with pytest.raises(ValueError, match="unknown div_forward_impl"):
        _div_drift_of(
            MDQM9Config(div_forward_impl="bogus", **base),
            model, params, template,
        )
    with pytest.raises(ValueError, match="gauss"):
        _div_drift_of(
            MDQM9Config(
                div_forward_impl="pair_tangent",
                **{**base, "dlogp_quad_points": 0},
            ),
            model, params, template,
        )
    with pytest.raises(ValueError, match="does not support"):
        _div_drift_of(
            MDQM9Config(
                div_forward_impl="pair_tangent",
                **{**base, "divergence": "hutchpp"},
            ),
            model, params, template,
        )


def test_bf16_profile_smoke(setup):
    model, params, template, x, t, temps = setup
    k_lanes = 3
    z = jax.random.normal(jax.random.PRNGKey(5), (B, k_lanes, N_ATOMS, 3))
    vel, dvel = apply_dense_pair_tangent(
        model, params, x, t, temps, z, template.atom_ids, template.edges,
        interpret=True, compute_dtype="bf16_agg",
    )
    vel_f32, dvel_f32 = apply_dense_pair_tangent(
        model, params, x, t, temps, z, template.atom_ids, template.edges,
        interpret=True,
    )
    assert np.all(np.isfinite(np.asarray(vel)))
    assert np.all(np.isfinite(np.asarray(dvel)))
    # bf16 storage: loose agreement with the f32 profile
    np.testing.assert_allclose(
        np.asarray(vel), np.asarray(vel_f32), rtol=0.1, atol=0.02
    )
    scale = np.maximum(np.abs(np.asarray(dvel_f32)).max(), 1e-3)
    assert np.abs(np.asarray(dvel) - np.asarray(dvel_f32)).max() / scale < 0.15
