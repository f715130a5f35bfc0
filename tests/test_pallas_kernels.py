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


def test_fused_mlp_interpret_matches(setup):
    from ti_tpu.ops.pallas_kernels import fused_mlp

    in_feat, pe, phi, w, _ = setup
    phi_mod = MLP(F, 5 * F)
    # rebuild flax output for the single-MLP case
    params = {"params": {
        "Dense_0": {"kernel": phi.w1, "bias": phi.b1},
        "LayerNorm_0": {"scale": phi.ln1_scale, "bias": phi.ln1_bias},
        "Dense_1": {"kernel": phi.w2, "bias": phi.b2},
        "LayerNorm_1": {"scale": phi.ln2_scale, "bias": phi.ln2_bias},
        "Dense_2": {"kernel": phi.w3, "bias": phi.b3},
    }}
    expected = phi_mod.apply(params, in_feat)
    out = fused_mlp(in_feat, phi, tile=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_fused_forward_matches_model_apply():
    """apply_fused == vmap(model.apply) on the same parameter tree."""
    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.models.cpainn import CPaiNN, MolGraph
    from ti_tpu.models.cpainn_fused import apply_fused

    mol = make_synthetic_molecule(n_atoms=6, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=16, score_layers=2, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)

    key = jax.random.PRNGKey(1)
    xs = 0.3 * jax.random.normal(key, (3, 6, 3))
    ts = jnp.array([0.2, 0.5, 0.9])
    temps = jnp.tile(jnp.array([700.0, 300.0]), (3, 1))

    ref = jax.vmap(
        lambda x, t, tp: model.apply(
            params, MolGraph(x, template.atom_ids, t, tp, template.edges)
        )
    )(xs, ts, temps)
    out = apply_fused(
        model, params, xs, ts, temps, template.atom_ids, template.edges,
        interpret=True, tile=32,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-4)


def test_mlp_block_jvp_matches_jax_jvp(setup):
    """Hand-written recompute JVP == jax.jvp of the jnp composition."""
    from ti_tpu.ops.pallas_kernels import (
        _mlp_block,
        _mlp_block_jvp,
        edge_mlp_jvp_reference,
        fused_edge_mlp_reference,
    )

    in_feat, pe, phi, w, _ = setup
    key = jax.random.PRNGKey(7)
    din = jax.random.normal(key, in_feat.shape)
    dpe = jax.random.normal(jax.random.fold_in(key, 1), pe.shape)

    out, dout = _mlp_block_jvp(in_feat, din, phi)
    out_ref, dout_ref = jax.jvp(lambda x: _mlp_block(x, phi), (in_feat,), (din,))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dout), np.asarray(dout_ref), rtol=1e-4, atol=1e-5)

    dprod = edge_mlp_jvp_reference(in_feat, pe, din, dpe, phi, w)
    _, dprod_ref = jax.jvp(
        lambda x, q: fused_edge_mlp_reference(x, q, phi, w), (in_feat, pe), (din, dpe)
    )
    np.testing.assert_allclose(np.asarray(dprod), np.asarray(dprod_ref), rtol=1e-4, atol=1e-5)


def test_edge_jvp_kernel_interpret_matches(setup):
    from ti_tpu.ops.pallas_kernels import edge_mlp_jvp_reference, fused_edge_mlp_jvp

    in_feat, pe, phi, w, _ = setup
    key = jax.random.PRNGKey(8)
    din = jax.random.normal(key, in_feat.shape)
    dpe = jax.random.normal(jax.random.fold_in(key, 1), pe.shape)

    expected = edge_mlp_jvp_reference(in_feat, pe, din, dpe, phi, w)
    out = fused_edge_mlp_jvp(in_feat, pe, din, dpe, phi, w, tile=32, interpret=True)
    assert out.shape == (R, 5 * F)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_fused_edge_mlp_diff_linearize(setup):
    """custom_jvp wrapper: linearize tangents == reference tangents; weight
    tangents fall back to the jnp JVP."""
    from ti_tpu.ops.pallas_kernels import (
        fused_edge_mlp_diff,
        fused_edge_mlp_reference,
    )

    in_feat, pe, phi, w, expected = setup
    f = fused_edge_mlp_diff(32, True)

    out, f_lin = jax.linearize(lambda x, q: f(x, q, phi, w), in_feat, pe)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-4, atol=1e-4)

    key = jax.random.PRNGKey(9)
    din = jax.random.normal(key, in_feat.shape)
    dpe = jax.random.normal(jax.random.fold_in(key, 1), pe.shape)
    _, dref = jax.jvp(
        lambda x, q: fused_edge_mlp_reference(x, q, phi, w), (in_feat, pe), (din, dpe)
    )
    np.testing.assert_allclose(
        np.asarray(f_lin(din, dpe)), np.asarray(dref), rtol=1e-4, atol=1e-4
    )
    # one-sided (symbolic-zero pe tangent) lane, as in layer 0 of the
    # dense divergence path
    _, dref1 = jax.jvp(
        lambda x: fused_edge_mlp_reference(x, pe, phi, w), (in_feat,), (din,)
    )
    np.testing.assert_allclose(
        np.asarray(f_lin(din, jnp.zeros_like(dpe))), np.asarray(dref1),
        rtol=1e-4, atol=1e-4,
    )

    # weight-tangent fallback path stays correct
    dphi = jax.tree.map(jnp.ones_like, phi)
    _, dref_w = jax.jvp(
        lambda ph: fused_edge_mlp_reference(in_feat, pe, ph, w), (phi,), (dphi,)
    )
    _, dgot_w = jax.jvp(lambda ph: f(in_feat, pe, ph, w), (phi,), (dphi,))
    np.testing.assert_allclose(np.asarray(dgot_w), np.asarray(dref_w), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_dense_fused_divergence_matches_unfused():
    """apply_dense(fused=True) forward + exact divergence == fused=False."""
    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.models.cpainn import CPaiNN
    from ti_tpu.models.cpainn_dense import apply_dense
    from ti_tpu.ops.divergence import divergence_exact

    mol = make_synthetic_molecule(n_atoms=6, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=16, score_layers=2, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)

    key = jax.random.PRNGKey(1)
    xs = 0.3 * jax.random.normal(key, (2, 6, 3))
    temps = jnp.tile(jnp.array([700.0, 300.0]), (2, 1))

    def v(x, fused):
        return apply_dense(
            model, params, x[None], jnp.array([0.5]), temps[:1],
            template.atom_ids, template.edges,
            fused=fused, tile=32, interpret=True,
        )[0]

    out_ref = v(xs[0], False)
    out_fused = v(xs[0], True)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), rtol=1e-4, atol=1e-5
    )

    _, d_ref = divergence_exact(lambda x: v(x, False), xs[0])
    _, d_fused = divergence_exact(lambda x: v(x, True), xs[0])
    np.testing.assert_allclose(float(d_fused), float(d_ref), rtol=1e-3)


@pytest.mark.parametrize("lane_chunk", [None, 5])
@pytest.mark.slow
def test_hand_jvp_divergence_matches_linearize(lane_chunk):
    """ops/dense_divergence (hand-propagated lane-batched tangents) must
    reproduce divergence_exact over apply_dense bit-for-tolerance."""
    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.models.cpainn import CPaiNN
    from ti_tpu.models.cpainn_dense import apply_dense
    from ti_tpu.ops.dense_divergence import dense_divergence
    from ti_tpu.ops.divergence import divergence_exact

    mol = make_synthetic_molecule(n_atoms=6, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=16, score_layers=2, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)

    key = jax.random.PRNGKey(1)
    xs = 0.3 * jax.random.normal(key, (3, 6, 3))
    temps = jnp.tile(jnp.array([700.0, 300.0]), (3, 1))

    def v_dense(x):
        return apply_dense(
            model, params, x[None], jnp.array([0.5]), temps[:1],
            template.atom_ids, template.edges,
        )[0]

    for i in range(3):
        vel_ref, div_ref = divergence_exact(v_dense, xs[i])
        vel, div = dense_divergence(
            model, params, xs[i], jnp.asarray(0.5), temps[0],
            template.atom_ids, template.edges, lane_chunk=lane_chunk,
        )
        np.testing.assert_allclose(
            np.asarray(vel), np.asarray(vel_ref), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(float(div), float(div_ref), rtol=2e-4)


@pytest.mark.slow
def test_dense_forward_matches_model_apply():
    """Dense (N x N) pair formulation == vmap(model.apply), and its exact
    divergence matches too (it must serve the dlogp path)."""
    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.models.cpainn import CPaiNN, MolGraph
    from ti_tpu.models.cpainn_dense import apply_dense
    from ti_tpu.ops.divergence import divergence_exact

    mol = make_synthetic_molecule(n_atoms=6, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=16, score_layers=2, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)

    key = jax.random.PRNGKey(1)
    xs = 0.3 * jax.random.normal(key, (3, 6, 3))
    ts = jnp.array([0.2, 0.5, 0.9])
    temps = jnp.tile(jnp.array([700.0, 300.0]), (3, 1))

    ref = jax.vmap(
        lambda x, t, tp: model.apply(
            params, MolGraph(x, template.atom_ids, t, tp, template.edges)
        )
    )(xs, ts, temps)
    out = apply_dense(model, params, xs, ts, temps, template.atom_ids, template.edges)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-4)

    # divergence parity (dense path is differentiable)
    def v_edge(x):
        return model.apply(
            params, MolGraph(x, template.atom_ids, jnp.array(0.5), temps[0], template.edges)
        )

    def v_dense(x):
        return apply_dense(
            model, params, x[None], jnp.array([0.5]), temps[:1],
            template.atom_ids, template.edges,
        )[0]

    _, d1 = divergence_exact(v_edge, xs[0])
    _, d2 = divergence_exact(v_dense, xs[0])
    np.testing.assert_allclose(float(d2), float(d1), rtol=1e-3)


@pytest.mark.parametrize("lanes_per_chunk", [4, 6])
@pytest.mark.slow
def test_divergence_kernel_matches_linearize(lanes_per_chunk):
    """Whole-net divergence kernel (interpret mode) == divergence_exact."""
    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.models.cpainn import CPaiNN
    from ti_tpu.models.cpainn_dense import apply_dense
    from ti_tpu.ops.div_kernel import divergence_kernel_batch
    from ti_tpu.ops.divergence import divergence_exact

    mol = make_synthetic_molecule(n_atoms=6, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=16, score_layers=2, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)

    key = jax.random.PRNGKey(1)
    xs = 0.3 * jax.random.normal(key, (3, 6, 3))
    temps = jnp.tile(jnp.array([700.0, 300.0]), (3, 1))

    def v_dense(x):
        return apply_dense(
            model, params, x[None], jnp.array([0.5]), temps[:1],
            template.atom_ids, template.edges,
        )[0]

    refs = np.array([float(divergence_exact(v_dense, xs[i])[1]) for i in range(3)])
    divs = divergence_kernel_batch(
        model, params, xs, 0.5, temps, template,
        lanes_per_chunk=lanes_per_chunk, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(divs), refs, rtol=3e-4)


@pytest.mark.slow
def test_bf16_compute_dtype_parity():
    """apply_dense(compute_dtype=bf16): f32 params/IO, bf16 pair-grid
    compute — forward and exact divergence stay within bf16-roundoff of the
    full-precision path (the mixed-precision profile for the HBM-bound
    divergence tangents, BASELINE.md)."""
    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.models.cpainn import CPaiNN
    from ti_tpu.models.cpainn_dense import apply_dense
    from ti_tpu.ops.divergence import divergence_exact

    mol = make_synthetic_molecule(n_atoms=9, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=32, score_layers=3, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)
    xs = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (4, 9, 3))
    t = jnp.full((4,), 0.5)
    temps = jnp.tile(jnp.array([1000.0, 300.0]), (4, 1))

    y32 = apply_dense(model, params, xs, t, temps, template.atom_ids, template.edges)
    y16 = apply_dense(
        model, params, xs, t, temps, template.atom_ids, template.edges,
        compute_dtype=jnp.bfloat16,
    )
    assert y16.dtype == y32.dtype == jnp.float32
    rel = float(jnp.linalg.norm(y32 - y16) / jnp.linalg.norm(y32))
    assert rel < 0.05, rel

    def v_of(cd):
        def g(y):
            return apply_dense(
                model, params, y[None], t[:1], temps[:1],
                template.atom_ids, template.edges, compute_dtype=cd,
            )[0]
        return g

    d32 = float(divergence_exact(v_of(None), xs[0])[1])
    d16 = float(divergence_exact(v_of(jnp.bfloat16), xs[0])[1])
    assert abs(d32 - d16) / abs(d32) < 0.03, (d32, d16)


@pytest.mark.slow
def test_bf16_agg_compute_dtype_parity():
    """compute_dtype='bf16_agg' (bf16 dot outputs, f32 MXU accumulation and
    LN statistics — the bench headline profile) stays within bf16-roundoff
    of full precision at random init; trained-field physics qualification
    in BASELINE.md (dF oracle error at the f32 statistical floor)."""
    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.models.cpainn import CPaiNN
    from ti_tpu.models.cpainn_dense import apply_dense
    from ti_tpu.ops.divergence import divergence_exact

    mol = make_synthetic_molecule(n_atoms=9, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=32, score_layers=3, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)
    xs = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (4, 9, 3))
    t = jnp.full((4,), 0.5)
    temps = jnp.tile(jnp.array([1000.0, 300.0]), (4, 1))

    y32 = apply_dense(model, params, xs, t, temps, template.atom_ids, template.edges)
    ya = apply_dense(
        model, params, xs, t, temps, template.atom_ids, template.edges,
        compute_dtype="bf16_agg",
    )
    assert ya.dtype == jnp.float32
    rel = float(jnp.linalg.norm(y32 - ya) / jnp.linalg.norm(y32))
    assert rel < 0.08, rel  # random-init magnitudes overstate trained error

    def v_of(cd):
        def g(y):
            return apply_dense(
                model, params, y[None], t[:1], temps[:1],
                template.atom_ids, template.edges, compute_dtype=cd,
            )[0]
        return g

    d32 = float(divergence_exact(v_of(None), xs[0])[1])
    da = float(divergence_exact(v_of("bf16_agg"), xs[0])[1])
    assert abs(d32 - da) / abs(d32) < 0.06, (d32, da)


@pytest.mark.slow
def test_fused_rejects_compute_dtype():
    """fused=True + compute_dtype is an explicit error (kernel out_shape
    follows the cast input dtype while its body computes f32)."""
    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.models.cpainn import CPaiNN
    from ti_tpu.models.cpainn_dense import apply_dense

    mol = make_synthetic_molecule(n_atoms=4, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=8, score_layers=1, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)
    with pytest.raises(ValueError, match="incompatible"):
        apply_dense(
            model, params, jnp.zeros((1, 4, 3)), jnp.zeros((1,)),
            jnp.tile(jnp.array([700.0, 300.0]), (1, 1)),
            template.atom_ids, template.edges,
            fused=True, compute_dtype=jnp.bfloat16,
        )
