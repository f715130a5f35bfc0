"""Parity of the fused pair-layer kernel against apply_dense.

The kernel recomputes pair geometry + positional encoding in VMEM and
aggregates via a selection matmul — the math must match the XLA dense-pair
formulation (models/cpainn_dense.py) exactly (f32, complete graph).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
from ti_tpu.models.cpainn import CPaiNN, MolGraph
from ti_tpu.models.cpainn_dense import apply_dense
from ti_tpu.ops.pair_layer_kernel import apply_dense_pair_kernel


@pytest.mark.parametrize("n_atoms,features,layers", [(6, 16, 2), (19, 128, 2)])
def test_pair_layer_kernel_matches_apply_dense(n_atoms, features, layers):
    mol = make_synthetic_molecule(n_atoms=n_atoms, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=features, score_layers=layers,
                   conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)

    b = 3
    key = jax.random.PRNGKey(1)
    xs = 0.3 * jax.random.normal(key, (b, n_atoms, 3), jnp.float32)
    xs = xs - xs.mean(axis=1, keepdims=True)
    ts = jnp.array([0.2, 0.5, 0.9])
    temps = jnp.tile(jnp.array([700.0, 300.0]), (b, 1))

    ref = apply_dense(model, params, xs, ts, temps, template.atom_ids,
                      template.edges)
    out = apply_dense_pair_kernel(model, params, xs, ts, temps,
                                  template.atom_ids, template.edges,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("n_atoms,features,layers", [(6, 16, 2), (19, 128, 2)])
def test_pair_layer_kernel_bf16_profile(n_atoms, features, layers):
    """The bf16 VMEM profile (compute_dtype='bf16_agg'): same math at bf16
    tolerance — pair-grid tensors live in bf16, dots accumulate f32, LN
    statistics stay f32 (the dense bf16_agg semantics)."""
    mol = make_synthetic_molecule(n_atoms=n_atoms, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=features, score_layers=layers,
                   conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)

    b = 3
    key = jax.random.PRNGKey(1)
    xs = 0.3 * jax.random.normal(key, (b, n_atoms, 3), jnp.float32)
    xs = xs - xs.mean(axis=1, keepdims=True)
    ts = jnp.array([0.2, 0.5, 0.9])
    temps = jnp.tile(jnp.array([700.0, 300.0]), (b, 1))

    ref = apply_dense(model, params, xs, ts, temps, template.atom_ids,
                      template.edges)
    out = apply_dense_pair_kernel(model, params, xs, ts, temps,
                                  template.atom_ids, template.edges,
                                  interpret=True, compute_dtype="bf16_agg")
    assert out.dtype == jnp.float32
    scale = np.maximum(np.abs(np.asarray(ref)).max(), 1e-3)
    # primary parity target: the dense bf16_agg forward (the SAME
    # mixed-precision semantics, different schedule) — measured 2.5% at
    # F=16 / 0.6% at F=128 on random-init fields
    ref_bf = apply_dense(model, params, xs, ts, temps, template.atom_ids,
                         template.edges, compute_dtype="bf16_agg")
    np.testing.assert_allclose(np.asarray(out) / scale,
                               np.asarray(ref_bf) / scale, atol=4e-2)
    # sanity vs f32: bounded by the bf16 profile's own distance from f32
    # (the dense bf16_agg path measures 7.5% at this tiny F=16 model)
    np.testing.assert_allclose(np.asarray(out) / scale,
                               np.asarray(ref) / scale, atol=1.5e-1)

    with pytest.raises(ValueError, match="bf16_agg"):
        apply_dense_pair_kernel(model, params, xs, ts, temps,
                                template.atom_ids, template.edges,
                                interpret=True, compute_dtype="f64")


def test_pair_layer_kernel_latent_conditioning():
    mol = make_synthetic_molecule(n_atoms=5, seed=0)
    template = graph_template(mol, t_cond=1)
    model = CPaiNN(n_features=16, score_layers=1, conditioning="latent")
    params = model.init(jax.random.PRNGKey(0), template)
    xs = 0.2 * jax.random.normal(jax.random.PRNGKey(2), (2, 5, 3), jnp.float32)
    ts = jnp.array([0.1, 0.8])
    temps = jnp.full((2, 1), 500.0)
    ref = apply_dense(model, params, xs, ts, temps, template.atom_ids,
                      template.edges)
    out = apply_dense_pair_kernel(model, params, xs, ts, temps,
                                  template.atom_ids, template.edges,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_pair_layer_kernel_rejects_cutoff():
    mol = make_synthetic_molecule(n_atoms=5, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=16, score_layers=1, conditioning="ambient",
                   cutoff=1.0)
    params = CPaiNN(n_features=16, score_layers=1,
                    conditioning="ambient").init(jax.random.PRNGKey(0), template)
    xs = jnp.zeros((1, 5, 3))
    with pytest.raises(NotImplementedError, match="complete graph"):
        apply_dense_pair_kernel(model, params, xs, jnp.zeros(1),
                                jnp.tile(jnp.array([700.0, 300.0]), (1, 1)),
                                template.atom_ids, template.edges,
                                interpret=True)


def test_traj_drift_matches_default_sampler():
    """make_ode_sampler(traj_drift=): the batched-trajectory segment path
    reproduces the default vmap(v_fn) trajectory (same RK tableau), with
    (a) the XLA dense drift exactly-ish and (b) the fused pair-layer
    kernel (interpret) at kernel parity tolerance."""
    from ti_tpu.models.cpainn_dense import dense_velocity_fn
    from ti_tpu.sampling.drivers import make_ode_sampler, molecular_v_fn_of

    mol = make_synthetic_molecule(n_atoms=5, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=16, score_layers=2, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)
    v_fn_of = molecular_v_fn_of(model, params, template)

    kw = dict(solver="rk4", n_steps=8, n_save=2, return_dlogp=True,
              divergence="exact", dlogp_quad_points=4, dlogp_quad="gauss",
              steps_per_dispatch=4)
    base = make_ode_sampler(v_fn_of, **kw)

    xs = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (3, 5, 3), jnp.float32)
    xs = xs - xs.mean(axis=1, keepdims=True)
    temps = jnp.tile(jnp.array([700.0, 300.0]), (3, 1))
    key = jax.random.PRNGKey(2)
    ref = base(xs, temps, key)

    dense_drift = dense_velocity_fn(model, params, template)
    out = make_ode_sampler(v_fn_of, traj_drift=dense_drift, **kw)(xs, temps, key)
    np.testing.assert_allclose(np.asarray(out.xs), np.asarray(ref.xs),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.dlogp[:, -1]),
                               np.asarray(ref.dlogp[:, -1]),
                               rtol=1e-3, atol=1e-3)

    def pk_drift(x, t, conds):
        tb = jnp.broadcast_to(jnp.asarray(t), (x.shape[0],))
        return apply_dense_pair_kernel(model, params, x, tb, conds,
                                       template.atom_ids, template.edges,
                                       interpret=True)

    out2 = make_ode_sampler(v_fn_of, traj_drift=pk_drift, **kw)(xs, temps, key)
    np.testing.assert_allclose(np.asarray(out2.xs), np.asarray(ref.xs),
                               rtol=1e-3, atol=1e-4)

    with pytest.raises(ValueError, match="segmented gauss"):
        make_ode_sampler(v_fn_of, traj_drift=dense_drift, solver="rk4",
                         n_steps=8, return_dlogp=True, divergence="exact")


@pytest.mark.parametrize("impl", ["pair_kernel", "pair_kernel_bf16"])
def test_sample_ambient_traj_forward_impl(impl):
    """cfg.traj_forward_impl wires the fused pair-layer kernel into the
    production ambient sampler's trajectory segments (drivers._traj_drift_of;
    interpret mode off-TPU): same trajectories/dlogp as the default path at
    the kernel's dtype tolerance."""
    from ti_tpu.config import MDQM9Config
    from ti_tpu.sampling.drivers import sample_ambient

    mol = make_synthetic_molecule(n_atoms=5, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=16, score_layers=2, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)

    kw = dict(
        solver_type="rk4", n_steps=8, return_dlogp=True, divergence="exact",
        dlogp_quad="gauss", dlogp_quad_points=4, steps_per_dispatch=4,
        sampling_T0=700, sampling_T1=300, batch_size=4, seed=0,
    )
    x0 = 0.2 * np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (4, 5, 3), jnp.float32)
    )
    x0 = x0 - x0.mean(axis=1, keepdims=True)

    ref = sample_ambient(MDQM9Config(**kw), model, params, template, x0,
                         save=False)
    out = sample_ambient(MDQM9Config(traj_forward_impl=impl, **kw),
                         model, params, template, x0, save=False)
    tol = dict(rtol=1e-3, atol=1e-4) if impl == "pair_kernel" else dict(atol=6e-2)
    np.testing.assert_allclose(out["samples"], ref["samples"], **tol)
    np.testing.assert_allclose(
        out["dlogps"], ref["dlogps"],
        **(dict(rtol=1e-3, atol=1e-3) if impl == "pair_kernel"
           else dict(atol=0.3)),
    )

    # the hook demands the segmented gauss path
    bad = MDQM9Config(traj_forward_impl=impl, **{**kw, "dlogp_quad": "simpson",
                                                 "dlogp_quad_points": 5})
    with pytest.raises(ValueError, match="gauss"):
        sample_ambient(bad, model, params, template, x0, save=False)


def test_sample_latent_traj_forward_impl():
    """The latent (BG) driver honors traj_forward_impl too — same noise
    seed, same trajectories as the default path at kernel tolerance."""
    from ti_tpu.config import MDQM9Config
    from ti_tpu.sampling.drivers import sample_latent

    mol = make_synthetic_molecule(n_atoms=5, seed=0)
    template = graph_template(mol, t_cond=1)
    model = CPaiNN(n_features=16, score_layers=2, conditioning="latent")
    params = model.init(jax.random.PRNGKey(0), template)

    kw = dict(
        solver_type="rk4", n_steps=8, return_dlogp=True, divergence="exact",
        dlogp_quad="gauss", dlogp_quad_points=4, steps_per_dispatch=4,
        sampling_T=300, batch_size=4, seed=0,
    )
    ref = sample_latent(MDQM9Config(**kw), model, params, template,
                        n_samples=4, save=False)
    out = sample_latent(MDQM9Config(traj_forward_impl="pair_kernel", **kw),
                        model, params, template, n_samples=4, save=False)
    np.testing.assert_allclose(out["samples"], ref["samples"],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(out["dlogps"], ref["dlogps"],
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("chain_block,compute_dtype", [
    (2, None), (4, None), (2, "bf16_agg"),
])
def test_pair_layer_kernel_chain_block_parity(chain_block, compute_dtype):
    """The chain-blocked kernel (C chains per grid step via selection
    matmuls, _pair_layer_kernel_cb) must match the per-chain kernel
    exactly — including a batch that is NOT a multiple of the block (tail
    padding sliced back)."""
    mol = make_synthetic_molecule(n_atoms=7, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=16, score_layers=2, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)

    b = 5  # deliberately not divisible by chain_block
    key = jax.random.PRNGKey(1)
    xs = 0.3 * jax.random.normal(key, (b, 7, 3), jnp.float32)
    xs = xs - xs.mean(axis=1, keepdims=True)
    ts = jnp.linspace(0.1, 0.9, b)
    temps = jnp.tile(jnp.array([700.0, 300.0]), (b, 1))

    base = apply_dense_pair_kernel(
        model, params, xs, ts, temps, template.atom_ids, template.edges,
        interpret=True, compute_dtype=compute_dtype,
    )
    blocked = apply_dense_pair_kernel(
        model, params, xs, ts, temps, template.atom_ids, template.edges,
        interpret=True, compute_dtype=compute_dtype, chain_block=chain_block,
    )
    tol = dict(rtol=2e-2, atol=2e-3) if compute_dtype else dict(rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(base), **tol)
