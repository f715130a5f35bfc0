"""Fused edge-MLP Pallas kernel: interpret-mode parity with flax MLPs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ti_tpu.models.embeddings import MLP
from ti_tpu.ops.pallas_kernels import (
    MLPWeights,
    fused_edge_mlp,
    fused_edge_mlp_reference,
    mlp_weights_from_flax,
)

F = 16
R = 70  # deliberately not a tile multiple


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    in_feat = jax.random.normal(key, (R, 2 * F))
    pe = jax.random.normal(jax.random.fold_in(key, 1), (R, F))

    phi_mod = MLP(F, 5 * F)
    w_mod = MLP(F, 5 * F)
    phi_params = phi_mod.init(jax.random.fold_in(key, 2), in_feat)
    w_params = w_mod.init(jax.random.fold_in(key, 3), pe)

    expected = phi_mod.apply(phi_params, in_feat) * w_mod.apply(w_params, pe)
    phi = mlp_weights_from_flax(phi_params["params"])
    w = mlp_weights_from_flax(w_params["params"])
    return in_feat, pe, phi, w, expected


def test_reference_impl_matches_flax(setup):
    in_feat, pe, phi, w, expected = setup
    out = fused_edge_mlp_reference(in_feat, pe, phi, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5, atol=1e-5)


def test_pallas_kernel_interpret_matches(setup):
    in_feat, pe, phi, w, expected = setup
    out = fused_edge_mlp(in_feat, pe, phi, w, tile=32, interpret=True)
    assert out.shape == (R, 5 * F)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-4, atol=1e-4)
