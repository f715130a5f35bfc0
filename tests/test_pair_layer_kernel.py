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
