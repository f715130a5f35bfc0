"""Loss correctness: finiteness, gradients, and the variational minimizer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ti_tpu import interpolants
from ti_tpu.losses import adw_velocity_loss, molecular_velocity_loss
from ti_tpu.models.cpainn import CPaiNN, MolGraph
from ti_tpu.models.mlp import FCNetMultiBeta
from ti_tpu.ops.graph import make_edge_table


def test_adw_loss_finite_and_differentiable():
    model = FCNetMultiBeta(hidden_size=16, num_layers=2)
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 1)), jnp.ones((1, 1)), jnp.ones((1, 1)), jnp.ones((1, 1))
    )
    interp = interpolants.linear(a=0.9, gamma="brownian")
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (32, 1))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (32, 1))
    b0 = jnp.ones((32, 1))
    b1 = jnp.full((32, 1), 1.25)

    def loss(p):
        return adw_velocity_loss(model.apply, p, jax.random.PRNGKey(2), x0, x1, b0, b1, interp)

    val, grads = jax.value_and_grad(loss)(params)
    assert jnp.isfinite(val)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in jax.tree.leaves(grads))


def test_adw_loss_quadratic_minimizer_closed_form():
    """For a CONSTANT trial field b(x)=c the expected loss is
    0.5c^2*2 - c*E[(dtIt+gd z) + (dtIt-gd z)] = c^2 - 2c E[dtIt]
    minimized at c = E[dtIt] = E[x1-x0]; verify the quadratic shape."""
    interp = interpolants.linear(a=0.5, gamma="brownian")
    key = jax.random.PRNGKey(3)
    n = 40_000
    x0 = jax.random.normal(key, (n, 1))
    x1 = 2.0 + jax.random.normal(jax.random.fold_in(key, 1), (n, 1))

    def const_apply(c, xt, t, b0, b1):
        return jnp.full_like(xt, c)

    def loss_at(c):
        return float(
            adw_velocity_loss(
                lambda p, *a: const_apply(p, *a), c, jax.random.PRNGKey(4),
                x0, x1, jnp.ones((n, 1)), jnp.ones((n, 1)), interp,
            )
        )

    mean_v = float(jnp.mean(x1 - x0))  # = 2
    # quadratic: loss(c) = c^2 - 2 c mean_v (+ noise); compare three points
    l0, l1, l2 = loss_at(0.0), loss_at(mean_v), loss_at(2 * mean_v)
    assert l1 < l0 and l1 < l2
    assert abs((l0 - l1) - mean_v**2) < 0.1  # loss(0)-loss(c*) = c*^2


@pytest.fixture(scope="module")
def mol_setup():
    n_atoms = 5
    edges = make_edge_table(n_atoms)
    template = MolGraph(
        x=jnp.zeros((n_atoms, 3)),
        atom_ids=jnp.arange(n_atoms, dtype=jnp.int32),
        t=jnp.array(0.0),
        temps=jnp.zeros((2,)),
        edges=edges,
    )
    model = CPaiNN(n_features=8, score_layers=1, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)
    return model, params, template


@pytest.mark.slow
def test_molecular_loss_two_sided(mol_setup):
    model, params, template = mol_setup
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (4, 5, 3))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (4, 5, 3))
    temps = jnp.tile(jnp.array([700.0, 300.0]), (4, 1))
    interp = interpolants.linear(a=1.0, gamma="sin2")

    def loss(p):
        return molecular_velocity_loss(
            model.apply, p, jax.random.PRNGKey(2), template, x0, x1, temps, interp
        )

    val, grads = jax.value_and_grad(loss)(params)
    assert jnp.isfinite(val)
    gnorm = jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads)))
    assert jnp.isfinite(gnorm) and float(gnorm) > 0


def test_molecular_loss_one_sided_skips_minus(mol_setup):
    model, params, template = mol_setup
    template1 = MolGraph(
        x=template.x, atom_ids=template.atom_ids, t=template.t,
        temps=jnp.zeros((1,)), edges=template.edges,
    )
    model1 = CPaiNN(n_features=8, score_layers=1, conditioning="latent")
    params1 = model1.init(jax.random.PRNGKey(0), template1)
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (4, 5, 3))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (4, 5, 3))
    temps = jnp.full((4, 1), 500.0)
    interp = interpolants.one_sided_linear()

    val = molecular_velocity_loss(
        model1.apply, params1, jax.random.PRNGKey(2), template1, x0, x1, temps, interp,
        t_distr="beta21",
    )
    assert jnp.isfinite(val)


@pytest.mark.slow
def test_t_distr_variants(mol_setup):
    model, params, template = mol_setup
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (2, 5, 3))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (2, 5, 3))
    temps = jnp.tile(jnp.array([700.0, 300.0]), (2, 1))
    interp = interpolants.linear(a=1.0, gamma="sin2")
    for distr in ("uniform", "beta"):
        val = molecular_velocity_loss(
            model.apply, params, jax.random.PRNGKey(2), template, x0, x1, temps, interp,
            t_distr=distr,
        )
        assert jnp.isfinite(val)
    with pytest.raises(ValueError):
        molecular_velocity_loss(
            model.apply, params, jax.random.PRNGKey(2), template, x0, x1, temps, interp,
            t_distr="nope",
        )


def test_molecular_loss_dense_impl_matches_edge(mol_setup):
    """train_impl='dense': the batched (N x N) pair forward produces the
    same loss AND gradients as the vmapped edge impl (same key -> identical
    t/z draws), and the mixed-precision profiles stay close and finite."""
    from ti_tpu.train.common import make_batched_apply

    model, params, template = mol_setup
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (4, 5, 3))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (4, 5, 3))
    temps = jnp.tile(jnp.array([700.0, 300.0]), (4, 1))
    interp = interpolants.linear(a=1.0, gamma="sin2")

    class Cfg:
        train_impl = "dense"
        train_compute_dtype = "f32"

    def loss(p, batched):
        return molecular_velocity_loss(
            model.apply, p, jax.random.PRNGKey(2), template, x0, x1, temps,
            interp, batched_apply_fn=batched,
        )

    v_edge, g_edge = jax.value_and_grad(loss)(params, None)
    v_dense, g_dense = jax.value_and_grad(loss)(
        params, make_batched_apply(Cfg, model, template)
    )
    np.testing.assert_allclose(float(v_dense), float(v_edge), rtol=2e-5)
    for ge, gd in zip(jax.tree.leaves(g_edge), jax.tree.leaves(g_dense)):
        np.testing.assert_allclose(np.asarray(gd), np.asarray(ge), rtol=2e-3, atol=2e-5)

    # edge impl refuses mixed precision instead of silently ignoring it
    class BadCfg:
        train_impl = "edge"
        train_compute_dtype = "bf16"

    with pytest.raises(ValueError):
        make_batched_apply(BadCfg, model, template)


@pytest.mark.slow
def test_molecular_loss_dense_mixed_precision_profiles(mol_setup):
    """The dense-impl bf16 / bf16_agg training profiles produce finite,
    near-f32 losses with finite nonzero gradients. Slow tier: each dtype is
    a separate value_and_grad compile (~20 s each on the one-core CPU host);
    the f32 dense-vs-edge parity above stays in the fast tier."""
    from ti_tpu.train.common import make_batched_apply

    model, params, template = mol_setup
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (4, 5, 3))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (4, 5, 3))
    temps = jnp.tile(jnp.array([700.0, 300.0]), (4, 1))
    interp = interpolants.linear(a=1.0, gamma="sin2")

    class Cfg:
        train_impl = "dense"
        train_compute_dtype = "f32"

    def loss(p, batched):
        return molecular_velocity_loss(
            model.apply, p, jax.random.PRNGKey(2), template, x0, x1, temps,
            interp, batched_apply_fn=batched,
        )

    v_edge = loss(params, None)
    for dtype_name in ("bf16", "bf16_agg"):
        Cfg.train_compute_dtype = dtype_name
        v_b, g_b = jax.value_and_grad(loss)(
            params, make_batched_apply(Cfg, model, template)
        )
        assert jnp.isfinite(v_b)
        assert abs(float(v_b) - float(v_edge)) < 0.05 * (1.0 + abs(float(v_edge)))
        gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(g_b)))
        assert jnp.isfinite(gnorm) and float(gnorm) > 0
