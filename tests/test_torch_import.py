"""Torch checkpoint import: golden-output parity for FCNetMultiBeta and
structural round-trip for cPaiNN.

The ADW model is pure torch, so we instantiate the reference architecture
here (from its published equations, adw/thermo/models/simple.py:20-41),
randomize its weights, import them, and demand BITWISE-CLOSE outputs — a
true golden test of the import path and of our MLP layer semantics.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ti_tpu.models.cpainn import CPaiNN
from ti_tpu.models.mlp import FCNetMultiBeta
from ti_tpu.utils.torch_import import (
    cpainn_params_from_torch,
    fcnet_params_from_torch,
    load_torch_state_dict,
)

HID, LAYERS = 32, 3


def _torch_fcnet():
    """The reference FCNetMultiBeta architecture in torch
    (adw/thermo/models/simple.py:20-36): [x_t, t, beta_embed] -> MLP."""
    sizes = [1 + 2] + [HID] * LAYERS + [1]
    layers = []
    for i in range(len(sizes) - 1):
        layers.append(torch.nn.Linear(sizes[i], sizes[i + 1]))
        if i != len(sizes) - 2:
            layers.append(torch.nn.SiLU())
    net = torch.nn.Sequential(*layers)
    beta_embed = torch.nn.Sequential(
        torch.nn.Linear(3, HID), torch.nn.SiLU(),
        torch.nn.Linear(HID, HID), torch.nn.SiLU(),
        torch.nn.Linear(HID, 1),
    )
    mod = torch.nn.Module()
    mod.net = net
    mod.beta_embed = beta_embed
    return mod


def test_fcnet_golden_output_parity(tmp_path):
    torch.manual_seed(0)
    mod = _torch_fcnet()
    path = tmp_path / "fcnet.pt"
    torch.save(mod.state_dict(), path)

    sd = load_torch_state_dict(str(path))
    params = fcnet_params_from_torch(sd, num_layers=LAYERS)
    params = jax.tree.map(jnp.asarray, params)

    model = FCNetMultiBeta(hidden_size=HID, num_layers=LAYERS)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((16, 1)).astype(np.float32)
    t = rng.uniform(0, 1, (16, 1)).astype(np.float32)
    b0 = np.full((16, 1), 1.0, np.float32)
    b1 = np.full((16, 1), 1.25, np.float32)

    ours = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(b0), jnp.asarray(b1)))

    with torch.no_grad():
        be = mod.beta_embed(torch.tensor(np.concatenate([b0, b1, t], axis=1)))
        ref = mod.net(torch.cat([torch.tensor(np.concatenate([x, t], axis=1)), be], dim=1))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)


def _synthetic_cpainn_state_dict(F=8, layers=1, conditioning="ambient"):
    """State_dict with the reference cPaiNN naming/shapes (mdqm9/thermo/
    ambient/models/cpainn.py Sequential layout) and random values."""
    g = torch.Generator().manual_seed(0)

    def lin(i, o, bias=True):
        d = {"weight": torch.randn(o, i, generator=g) * 0.1}
        if bias:
            d["bias"] = torch.randn(o, generator=g) * 0.1
        return d

    def mlp(prefix, f_in, f_hidden, f_out, sd):
        for idx, i, o in ((0, f_in, f_hidden), (3, f_hidden, f_hidden), (6, f_hidden, f_out)):
            for k, v in lin(i, o).items():
                sd[f"{prefix}.mlp.{idx}.{k}"] = v
        for idx, n in ((1, f_hidden), (4, f_hidden)):
            sd[f"{prefix}.mlp.{idx}.weight"] = torch.ones(n)
            sd[f"{prefix}.mlp.{idx}.bias"] = torch.zeros(n)

    sd = {}
    n_cond = {"ambient": 2, "latent": 1, "none": 0}[conditioning]
    i_edge, i_atom = 2, 3
    i_combine = 4 + n_cond + 1
    i_painn = i_combine + 1
    sd[f"net.{i_edge}.embedding.weight"] = torch.randn(4, F, generator=g)
    sd[f"net.{i_atom}.embedding.weight"] = torch.randn(25, F, generator=g)
    mlp(f"net.{i_combine}.mlp", (2 + n_cond) * F, F, F, sd)
    base = f"net.{i_painn}.layers"
    for l in range(layers):
        mlp(f"{base}.{2*l}.phi", 2 * F, F, 5 * F, sd)
        mlp(f"{base}.{2*l}.w", F, F, 5 * F, sd)
        sd[f"{base}.{2*l+1}.u.linear.weight"] = torch.randn(F, F, generator=g)
        sd[f"{base}.{2*l+1}.v.linear.weight"] = torch.randn(F, F, generator=g)
        mlp(f"{base}.{2*l+1}.mlp", 2 * F, F, 3 * F, sd)
    mlp(f"{base}.{2*layers}.mlp", F, F, 2, sd)
    sd[f"{base}.{2*layers}.V.linear.weight"] = torch.randn(1, F, generator=g)
    return sd


@pytest.mark.parametrize("conditioning", ["ambient", "latent", "none"])
def test_cpainn_import_structural(conditioning, tmp_path):
    F, layers = 8, 1
    sd_t = _synthetic_cpainn_state_dict(F, layers, conditioning)
    path = tmp_path / "cpainn.pt"
    torch.save(sd_t, path)
    sd = load_torch_state_dict(str(path))
    params = cpainn_params_from_torch(sd, score_layers=layers, conditioning=conditioning)
    params = {"params": jax.tree.map(jnp.asarray, params["params"])}

    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.models.cpainn import MolGraph

    mol = make_synthetic_molecule(n_atoms=5, seed=0)
    n_cond = {"ambient": 2, "latent": 1, "none": 0}[conditioning]
    template = graph_template(mol, t_cond=n_cond)
    model = CPaiNN(n_features=F, score_layers=layers, conditioning=conditioning)

    # imported tree must match the init tree structure and shapes exactly
    ref_params = model.init(jax.random.PRNGKey(0), template)
    ref_flat = jax.tree_util.tree_flatten_with_path(ref_params)[0]
    imp_flat = jax.tree_util.tree_flatten_with_path(params)[0]
    assert [k for k, _ in ref_flat] == [k for k, _ in imp_flat]
    for (k, a), (_, b) in zip(ref_flat, imp_flat):
        assert a.shape == b.shape, (k, a.shape, b.shape)

    # and the model must run with the imported weights
    g = MolGraph(
        x=jnp.asarray(mol.positions, jnp.float32),
        atom_ids=template.atom_ids,
        t=jnp.array(0.5),
        temps=jnp.asarray([700.0, 300.0][:n_cond]),
        edges=template.edges,
    )
    out = model.apply(params, g)
    assert out.shape == (5, 3) and bool(jnp.all(jnp.isfinite(out)))
