"""Model tests: equivariance, chirality, conditioning modes, param parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ti_tpu.models.cpainn import CPaiNN, MolGraph
from ti_tpu.models.mlp import FCNetMultiBeta
from ti_tpu.models.embeddings import positional_encoding, temperature_encoding
from ti_tpu.ops.graph import make_edge_table

N_ATOMS = 6
F = 16


def _graph(key, conditioning="ambient"):
    x = jax.random.normal(key, (N_ATOMS, 3))
    x = x - x.mean(0)
    edges = make_edge_table(N_ATOMS)
    n_temps = {"ambient": 2, "latent": 1, "none": 0}[conditioning]
    temps = jnp.array([700.0, 300.0][:n_temps])
    return MolGraph(
        x=x,
        atom_ids=jnp.arange(N_ATOMS, dtype=jnp.int32),
        t=jnp.array(0.3),
        temps=temps,
        edges=edges,
    )


def _model(conditioning="ambient"):
    return CPaiNN(n_features=F, score_layers=2, conditioning=conditioning)


def _rotation(key):
    q, _ = jnp.linalg.qr(jax.random.normal(key, (3, 3)))
    return q * jnp.sign(jnp.linalg.det(q))


@pytest.mark.parametrize("conditioning", ["ambient", "latent", "none"])
def test_cpainn_runs_all_conditionings(conditioning):
    g = _graph(jax.random.PRNGKey(0), conditioning)
    model = _model(conditioning)
    params = model.init(jax.random.PRNGKey(1), g)
    out = model.apply(params, g)
    assert out.shape == (N_ATOMS, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_cpainn_rotation_equivariance():
    g = _graph(jax.random.PRNGKey(0))
    model = _model()
    params = model.init(jax.random.PRNGKey(1), g)
    r = _rotation(jax.random.PRNGKey(2))

    out = model.apply(params, g)
    out_rot = model.apply(params, MolGraph(g.x @ r.T, g.atom_ids, g.t, g.temps, g.edges))
    np.testing.assert_allclose(np.asarray(out_rot), np.asarray(out @ r.T), rtol=2e-3, atol=2e-5)


def test_cpainn_translation_invariance():
    g = _graph(jax.random.PRNGKey(0))
    model = _model()
    params = model.init(jax.random.PRNGKey(1), g)
    shift = jnp.array([1.0, -2.0, 0.5])
    out = model.apply(params, g)
    out_shift = model.apply(params, MolGraph(g.x + shift, g.atom_ids, g.t, g.temps, g.edges))
    np.testing.assert_allclose(np.asarray(out_shift), np.asarray(out), rtol=1e-4, atol=1e-5)


def test_cpainn_chirality_sensitive():
    # reflection is NOT equivariant: the gated cross-product term
    # (reference cpainn.py:296-302) breaks mirror symmetry
    g = _graph(jax.random.PRNGKey(0))
    model = _model()
    params = model.init(jax.random.PRNGKey(1), g)
    p = jnp.diag(jnp.array([1.0, 1.0, -1.0]))  # improper
    out = model.apply(params, g)
    out_ref = model.apply(params, MolGraph(g.x @ p.T, g.atom_ids, g.t, g.temps, g.edges))
    diff = float(jnp.max(jnp.abs(out_ref - out @ p.T)))
    assert diff > 1e-4, "model should be chirality-sensitive"


def test_cpainn_temperature_conditioning_matters():
    g = _graph(jax.random.PRNGKey(0))
    model = _model()
    params = model.init(jax.random.PRNGKey(1), g)
    out1 = model.apply(params, g)
    g2 = MolGraph(g.x, g.atom_ids, g.t, jnp.array([300.0, 1000.0]), g.edges)
    out2 = model.apply(params, g2)
    assert float(jnp.max(jnp.abs(out1 - out2))) > 1e-5


@pytest.mark.slow
def test_cpainn_vmaps_over_batch():
    g = _graph(jax.random.PRNGKey(0))
    model = _model()
    params = model.init(jax.random.PRNGKey(1), g)
    xs = jax.random.normal(jax.random.PRNGKey(2), (4, N_ATOMS, 3))
    ts = jnp.linspace(0.1, 0.9, 4)
    temps = jnp.tile(g.temps, (4, 1))
    out = jax.vmap(
        lambda x, t, tp: model.apply(params, MolGraph(x, g.atom_ids, t, tp, g.edges))
    )(xs, ts, temps)
    assert out.shape == (4, N_ATOMS, 3)


def test_cpainn_param_count_parity():
    """Parameter-count parity with the reference architecture.

    Derivation per reference module (F = n_features, L = score_layers):
    - embeddings: edge 4F + atom 25F (cpainn.py:71-72)
    - combine: MLP(4F -> F -> F)  [ambient 4F input, cpainn.py:86]
    - per layer: SE3Message phi MLP(2F->F->5F) + w MLP(F->F->5F)
      (cpainn.py:262-264); Update u,v (F*F each, no bias) + MLP(2F->F->3F)
      (cpainn.py:328-340); LayerReadout MLP(F->F->2) + V (F*1)
      (cpainn.py:418-423).
    MLP(i->h->o) params = (i*h + h) + 2h [LN] + (h*h + h) + 2h [LN] + (h*o + o).
    """

    def mlp_params(i, h, o):
        return (i * h + h) + 2 * h + (h * h + h) + 2 * h + (h * o + o)

    f, layers = F, 2
    expected = 4 * f + 25 * f  # embeddings
    expected += mlp_params(4 * f, f, f)  # combine
    per_layer = (
        mlp_params(2 * f, f, 5 * f)
        + mlp_params(f, f, 5 * f)
        + 2 * f * f
        + mlp_params(2 * f, f, 3 * f)
    )
    expected += layers * per_layer
    expected += mlp_params(f, f, 2) + f * 1  # readout

    g = _graph(jax.random.PRNGKey(0))
    model = _model()
    params = model.init(jax.random.PRNGKey(1), g)
    total = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert total == expected


def test_cpainn_atom_vocab_autosizes_past_25():
    """Positional atom ids beyond the reference's 25-slot table stay finite.

    Both reference pipelines feed arange(n_atoms) as atom ids
    (mdqm9_ambient.py:219-220) into a 25-slot embedding (cpainn.py:28);
    QM9 molecules reach 29 atoms, where torch would IndexError and a
    fixed-size flax Embed would silently return NaN. n_types=None sizes
    the table as max(25, n_atoms): (25, F) for small molecules (parameter
    parity with the reference), (n, F) and finite output beyond."""
    for n_atoms, expect_rows in [(6, 25), (29, 29)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (n_atoms, 3))
        g = MolGraph(
            x=x - x.mean(0),
            atom_ids=jnp.arange(n_atoms, dtype=jnp.int32),
            t=jnp.array(0.3),
            temps=jnp.array([700.0, 300.0]),
            edges=make_edge_table(n_atoms),
        )
        model = _model()
        params = model.init(jax.random.PRNGKey(1), g)
        table = params["params"]["atom_embed"]["embedding"]
        assert table.shape == (expect_rows, F)
        out = model.apply(params, g)
        assert bool(jnp.all(jnp.isfinite(out)))


def test_positional_encoding_shape_and_order():
    x = jnp.array([0.5])
    enc = positional_encoding(x, 4, max_length=10.0)
    assert enc.shape == (1, 4)
    # interleaved [cos1, sin1, cos2, sin2]
    ang1 = 0.5 / 10.0 * 1 * np.pi
    ang2 = 0.5 / 10.0 * 2 * np.pi
    np.testing.assert_allclose(
        np.asarray(enc[0]),
        [np.cos(ang1), np.sin(ang1), np.cos(ang2), np.sin(ang2)],
        rtol=1e-6,
    )


def test_temperature_encoding_normalization():
    temps = [300.0, 400.0, 500.0, 600.0, 700.0, 800.0, 900.0, 1000.0]
    enc = temperature_encoding(jnp.array([650.0]), 4, 100.0, temps)
    # (650 - 650) / 700 = 0 -> cos=1, sin=0 at every rank
    np.testing.assert_allclose(np.asarray(enc[0]), [1.0, 0.0, 1.0, 0.0], atol=1e-6)


def test_fcnet_shapes_and_conditioning():
    model = FCNetMultiBeta(hidden_size=32, num_layers=2)
    x = jnp.ones((5, 1))
    t = jnp.full((5, 1), 0.5)
    b0 = jnp.ones((5, 1))
    b1 = jnp.full((5, 1), 1.25)
    params = model.init(jax.random.PRNGKey(0), x, t, b0, b1)
    out = model.apply(params, x, t, b0, b1)
    assert out.shape == (5, 1)
    out2 = model.apply(params, x, t, b0, 2.0 * b1)
    assert float(jnp.max(jnp.abs(out - out2))) > 1e-6


def test_fcnet_param_count_parity():
    # reference FCNetMultiBeta (adw/thermo/models/simple.py:20-36):
    # net: Linear(in+2, h) + [Linear(h, h)]*(layers-1) + Linear(h, out)
    # beta_embed: Linear(3, h) + Linear(h, h) + Linear(h, 1)
    h, layers = 32, 3
    expected = (3 * h + h) + (layers - 1) * (h * h + h) + (h * 1 + 1)
    expected += (3 * h + h) + (h * h + h) + (h * 1 + 1)
    model = FCNetMultiBeta(hidden_size=h, num_layers=layers)
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 1)), jnp.ones((1, 1)), jnp.ones((1, 1)), jnp.ones((1, 1))
    )
    total = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert total == expected


def _radius_edge_table(x, cutoff, bond_index, bond_types):
    """Hand-built radius graph (reference AddRadiusGraph + AddBondGraph +
    Coalesce(max), mdqm9/thermo/utils.py:70-125): directed edges where
    dist <= cutoff, plus all bond edges; edge type = max(0, bond type)."""
    from ti_tpu.ops.graph import EdgeTable

    x = np.asarray(x)
    n = len(x)
    type_mat = np.zeros((n, n), dtype=np.int32)
    if bond_index is not None and bond_index.size:
        np.maximum.at(
            type_mat, (bond_index[0], bond_index[1]), np.asarray(bond_types, np.int32)
        )
    src, dst = [], []
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            within = np.linalg.norm(x[j] - x[i]) <= cutoff
            if within or type_mat[j, i] > 0:
                src.append(j)
                dst.append(i)
    return EdgeTable(
        src=jnp.asarray(np.asarray(src, np.int32)),
        dst=jnp.asarray(np.asarray(dst, np.int32)),
        edge_type=jnp.asarray(type_mat[np.asarray(src), np.asarray(dst)]),
        n_nodes=n,
        dst_major_complete=False,
    )


def test_cpainn_cutoff_masks_match_radius_graph():
    """Finite-cutoff masking of the static complete graph == running the
    model on a hand-built radius graph (the reference's PyG radius_graph
    semantics, mdqm9/thermo/utils.py:112-125); bond edges stay active even
    beyond the cutoff."""
    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule

    mol = make_synthetic_molecule(n_atoms=8, seed=0)
    template = graph_template(mol, t_cond=2)
    x = jnp.asarray(
        mol.positions - mol.positions.mean(0), jnp.float32
    ) + 0.05 * jax.random.normal(jax.random.PRNGKey(3), (8, 3))
    g = MolGraph(x, template.atom_ids, jnp.array(0.4),
                 jnp.array([700.0, 300.0]), template.edges)

    # pick a cutoff that excludes a nontrivial subset of the non-bonded
    # pairs but not all of them (and confirm at least one bonded pair
    # would also be excluded by distance alone — the always-active rule)
    d = np.linalg.norm(np.asarray(x)[None] - np.asarray(x)[:, None], axis=-1)
    cutoff = float(np.median(d[d > 0]))
    bonded = np.zeros((8, 8), bool)
    bonded[mol.bond_index[0], mol.bond_index[1]] = True
    off = ~bonded & ~np.eye(8, dtype=bool)
    assert (d[off] > cutoff).any() and (d[off] <= cutoff).any()

    model_cut = CPaiNN(n_features=F, score_layers=2, conditioning="ambient",
                       cutoff=cutoff)
    model_full = CPaiNN(n_features=F, score_layers=2, conditioning="ambient")
    params = model_full.init(jax.random.PRNGKey(1), g)

    masked = model_cut.apply(params, g)
    radius_edges = _radius_edge_table(x, cutoff, mol.bond_index, mol.bond_types)
    explicit = model_full.apply(
        params, MolGraph(x, template.atom_ids, g.t, g.temps, radius_edges)
    )
    np.testing.assert_allclose(np.asarray(masked), np.asarray(explicit),
                               rtol=1e-5, atol=1e-6)
    # and the masking is not a no-op at this cutoff
    full = model_full.apply(params, g)
    assert float(jnp.max(jnp.abs(masked - full))) > 1e-5


def test_dense_cutoff_matches_edge_path():
    """apply_dense honors model.cutoff identically to the edge-table path."""
    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.models.cpainn_dense import apply_dense

    mol = make_synthetic_molecule(n_atoms=6, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=F, score_layers=2, conditioning="ambient",
                   cutoff=1.1)
    xs = jnp.asarray(mol.positions - mol.positions.mean(0), jnp.float32)[None]
    xs = jnp.concatenate([xs, xs + 0.1 * jax.random.normal(
        jax.random.PRNGKey(2), xs.shape)])
    ts = jnp.array([0.2, 0.7])
    temps = jnp.tile(jnp.array([700.0, 300.0]), (2, 1))
    params = model.init(jax.random.PRNGKey(1), MolGraph(
        xs[0], template.atom_ids, ts[0], temps[0], template.edges))

    ref = jax.vmap(
        lambda x, t, tp: model.apply(
            params, MolGraph(x, template.atom_ids, t, tp, template.edges))
    )(xs, ts, temps)
    out = apply_dense(model, params, xs, ts, temps, template.atom_ids,
                      template.edges)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)
