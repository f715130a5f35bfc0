"""Golden numerical parity against the ACTUAL reference implementation.

When the reference tree is present (/root/reference), these tests import
its pure-torch/numpy modules as black-box oracles and compare ti_tpu
outputs elementwise — stronger evidence than restated formulas, and they
cover exactly the layers where a silent convention drift would corrupt
physics (interpolants, z-matrices, weights/free energies, gEDMD spectra).
Nothing is copied from the reference; it only executes.

Skipped entirely when the reference tree is absent (the suite must be
self-contained elsewhere — every module here also has reference-free
oracle tests in its own test file).
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not present"
)

if os.path.isdir(REF):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if not hasattr(np, "infty"):  # the reference's gedmd predates numpy 2.0
        np.infty = np.inf


def _t64(x):
    import torch

    return torch.tensor(np.asarray(x), dtype=torch.float64)


@pytest.fixture(autouse=True)
def _restore_torch_pi():
    """The reference's mol_geometry/z_matrix modules rebind
    torch.pi = torch.tensor(np.pi) — an f32 tensor — at import AND inside
    functions (mdqm9/analysis/utils/mol_geometry.py:4, z_matrix.py:32),
    silently degrading every later torch.pi use in the process (e.g. the
    sin2 interpolant) to f32. Harmless in the reference's one-script-per-
    process workflow; here each test gets torch.pi restored."""
    import math

    import torch

    yield
    torch.pi = math.pi


# ---------------------------------------------------------------------------
# interpolants
# ---------------------------------------------------------------------------


def test_adw_linear_interpolant_golden():
    from adw.thermo.interpolants import LinearInterpolant as RefLinear

    from ti_tpu.interpolants import linear

    rng = np.random.default_rng(0)
    t = rng.uniform(0.05, 0.95, (64, 1))
    x0, x1 = rng.standard_normal((64, 1)), rng.standard_normal((64, 1))

    ref = RefLinear(a=0.9)
    ours = linear(a=0.9, gamma="brownian")
    # ti_tpu evaluates in f32 (production dtype) vs the reference's f64 —
    # tolerances are f32 roundoff, not convention slack.
    for name, r, o in [
        ("It", ref.It(_t64(t), _t64(x0), _t64(x1)), ours.It(t, x0, x1)),
        ("dtIt", ref.dtIt(_t64(t), _t64(x0), _t64(x1)), ours.dtIt(t, x0, x1)),
        ("gamma", ref.gamma(_t64(t)), ours.gamma(t)),
        ("gamma_dot", ref.gamma_dot(_t64(t)), ours.gamma_dot(t)),
        ("gg_dot", ref.gg_dot(_t64(t)), ours.gg_dot(t)),
    ]:
        np.testing.assert_allclose(
            np.asarray(o, np.float64), r.numpy(), rtol=3e-5, atol=1e-6, err_msg=name
        )


@pytest.mark.parametrize("gamma", ["brownian", "sin2", "sig_sum"])
def test_mdqm9_ambient_gammas_golden(gamma):
    from mdqm9.thermo.ambient.interpolants import LinearInterpolant as RefLinear

    from ti_tpu.interpolants import linear

    rng = np.random.default_rng(1)
    t = rng.uniform(0.05, 0.95, (128,))
    ref = RefLinear(a=1.0, gamma=gamma)
    ours = linear(a=1.0, gamma=gamma)
    np.testing.assert_allclose(
        np.asarray(ours.gamma(t), np.float64), ref.gamma(_t64(t)).numpy(),
        rtol=3e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ours.gamma_dot(t), np.float64), ref.gamma_dot(_t64(t)).numpy(),
        rtol=3e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ours.gg_dot(t), np.float64), ref.gg_dot(_t64(t)).numpy(),
        rtol=3e-5, atol=1e-6,
    )


def test_latent_one_sided_interpolant_golden():
    """Same antithetic pair given the SAME z (the reference returns its
    internally-drawn z — here z := x0 per its one-sided convention,
    mdqm9/thermo/latent/interpolants.py:72-75)."""
    from mdqm9.thermo.latent.interpolants import (
        OneSidedLinearInterpolant as RefOneSided,
    )

    from ti_tpu.interpolants import one_sided_linear

    rng = np.random.default_rng(2)
    t = rng.uniform(0.05, 0.95, (32, 1))
    x0, x1 = rng.standard_normal((32, 1)), rng.standard_normal((32, 1))
    ref = RefOneSided()
    ours = one_sided_linear()
    np.testing.assert_allclose(
        np.asarray(ours.It(t, x0, x1), np.float64),
        ref.It(_t64(t), _t64(x0), _t64(x1)).numpy(), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ours.dtIt(t, x0, x1), np.float64),
        ref.dtIt(_t64(t), _t64(x0), _t64(x1)).numpy(), rtol=1e-6,
    )
    # the one-sided antithetic "+" state IS the interpolant itself
    # (It_p = t*x1 + (1-t)*x0, interpolants.py:73)
    it_p, _, _ = ref.calc_antithetic_xts(_t64(t), _t64(x0), _t64(x1))
    np.testing.assert_allclose(
        it_p.numpy(), np.asarray(ours.It(t, x0, x1), np.float64), rtol=1e-6
    )


# ---------------------------------------------------------------------------
# z-matrix layer
# ---------------------------------------------------------------------------


def test_zmatrix_construct_golden():
    import torch

    from mdqm9.analysis.utils.z_matrix import (
        construct_z_matrix_batch as ref_construct,
    )

    from ti_tpu.analysis.sort_atoms import (
        adjacency_from_bonds,
        compute_atom_order_and_references_groups,
    )
    from ti_tpu.analysis.zmatrix import construct_z_matrix_batch

    # branched chain: 0-1-2-3-4 with 5 on 1 and 6 on 3
    bonds = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (3, 6)]
    adj = adjacency_from_bonds(7, np.asarray(bonds).T)
    atom_order, _, ref_atoms = compute_atom_order_and_references_groups(adj)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((5, 7, 3)) * 2.0
    x_sorted = x[:, np.asarray(atom_order)]

    z_ref = ref_construct(torch.tensor(x_sorted, dtype=torch.float64), ref_atoms)
    z_ours = construct_z_matrix_batch(x_sorted, ref_atoms)
    np.testing.assert_allclose(
        np.asarray(z_ours, np.float64), z_ref.numpy(), rtol=1e-4, atol=1e-5
    )


def test_zmatrix_reference_deconstruct_roundtrip():
    """The reference's own NeRF inverse reconstructs coordinates from OUR
    z-matrices (cross-implementation round trip)."""
    import torch

    from mdqm9.analysis.utils.z_matrix import (
        construct_z_matrix_batch as ref_construct,
        deconstruct_z_matrix_batch as ref_deconstruct,
    )

    from ti_tpu.analysis.sort_atoms import (
        adjacency_from_bonds,
        compute_atom_order_and_references_groups,
    )
    from ti_tpu.analysis.zmatrix import construct_z_matrix_batch

    bonds = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5)]
    adj = adjacency_from_bonds(6, np.asarray(bonds).T)
    atom_order, _, ref_atoms = compute_atom_order_and_references_groups(adj)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((3, 6, 3)) * 2.0
    x_sorted = x[:, np.asarray(atom_order)]

    z_ours = np.asarray(construct_z_matrix_batch(x_sorted, ref_atoms), np.float64)
    out = ref_deconstruct(torch.tensor(z_ours, dtype=torch.float64), ref_atoms)
    x_rec = out[0] if isinstance(out, tuple) else out
    z_round = ref_construct(x_rec.to(torch.float64), ref_atoms)
    np.testing.assert_allclose(z_round.numpy(), z_ours, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# weights / ESS / free energies
# ---------------------------------------------------------------------------


def test_weights_ess_free_energy_golden():
    from mdqm9.analysis.utils import ess as ref_ess
    from mdqm9.analysis.utils import free_energy as ref_fe
    from mdqm9.analysis.utils import sensititvity as ref_sens

    from ti_tpu.analysis import free_energy as our_fe
    from ti_tpu.analysis import weights as our_w

    rng = np.random.default_rng(5)
    n = 500
    E0s, E1s = rng.standard_normal(n) + 30.0, rng.standard_normal(n) + 29.0
    dl_ti, dl_bg = rng.standard_normal(n), rng.standard_normal(n)
    z0s = rng.standard_normal((n, 8, 3))

    np.testing.assert_allclose(
        our_w.calc_ti_weights(E0s, E1s, dl_ti),
        ref_ess.calc_ti_weights(E0s, E1s, dl_ti), rtol=1e-12,
    )
    np.testing.assert_allclose(
        our_w.calc_importance_weights(z0s, E1s, dl_bg, dl_ti),
        ref_ess.calc_importance_weights(z0s, E1s, dl_bg, dl_ti), rtol=1e-9,
    )
    w = our_w.calc_ti_weights(E0s, E1s, dl_ti)
    assert our_w.calc_ess(w) == pytest.approx(ref_ess.calc_ESS(w), rel=1e-12)
    np.testing.assert_array_equal(
        our_w.filter_iqr(w, k=100), ref_sens.filter_iqr(w, k=100)
    )

    phis_ref, keep_ref = ref_fe.calc_phis_tfep(E0s, E1s, dl_ti, k=None)
    phis_ours, keep_ours = our_fe.calc_phis_tfep(E0s, E1s, dl_ti)
    np.testing.assert_allclose(phis_ours, phis_ref, rtol=1e-12)
    np.testing.assert_array_equal(keep_ours, keep_ref)
    ones = np.ones_like(phis_ours)
    assert our_fe.calc_tfep_dF(phis_ours, ones) == pytest.approx(
        float(ref_fe.calc_tfep_dF(phis_ref, ones)), rel=1e-9
    )
    phis_bg_ref = ref_fe.calc_phis_bg(E1s, dl_bg, k=None)
    np.testing.assert_allclose(our_fe.calc_phis_bg(E1s, dl_bg), phis_bg_ref, rtol=1e-12)
    phis_bgt_ref = ref_fe.calc_phis_bg_tfep(E0s, dl_bg, E1s, dl_ti, k=None)
    np.testing.assert_allclose(
        our_fe.calc_phis_bg_tfep(E0s, dl_bg, E1s, dl_ti), phis_bgt_ref, rtol=1e-12
    )


# ---------------------------------------------------------------------------
# gEDMD spectra
# ---------------------------------------------------------------------------


def _ref_rff():
    import importlib

    return importlib.import_module("gedmd.rff")


def test_gedmd_reversible_generator_golden():
    ref_rff = _ref_rff()

    from ti_tpu.gedmd.rff import sample_rff_gaussian, spectral_analysis_rff_generator

    rng = np.random.default_rng(6)
    X = rng.standard_normal((1, 4000))
    Omega = sample_rff_gaussian(0, 1, 40, 0.6)
    d_ref, W_ref, _ = ref_rff.spectral_analysis_rff_generator(
        X, Omega, 4, a=2.0, tol=1e-4, reversible=True
    )
    d_ours, _ = spectral_analysis_rff_generator(
        X, Omega, nev=4, a=2.0, tol=1e-4, reversible=True
    )
    np.testing.assert_allclose(np.sort(d_ours), np.sort(d_ref), rtol=1e-6, atol=1e-9)


def test_gedmd_nonreversible_generator_golden():
    """Round 2's non-reversible branch (drift b + general a) against the
    reference's eig path — same spectra from the same inputs."""
    ref_rff = _ref_rff()

    from ti_tpu.gedmd.rff import sample_rff_gaussian, spectral_analysis_rff_generator

    rng = np.random.default_rng(7)
    d, m = 2, 3000
    X = rng.standard_normal((d, m))
    b = -X  # OU drift at the data sites
    a_const = 1.0
    Omega = sample_rff_gaussian(1, d, 30, 1.0)
    d_ref, _, _ = ref_rff.spectral_analysis_rff_generator(
        X, Omega, 4, a=a_const, b=b, tol=1e-4, reversible=False
    )
    d_ours, _ = spectral_analysis_rff_generator(
        X, Omega, nev=4, a=a_const, b=b, tol=1e-4, reversible=False
    )
    np.testing.assert_allclose(
        np.sort_complex(d_ours), np.sort_complex(d_ref), rtol=1e-5, atol=1e-7
    )


def test_gedmd_koopman_operator_golden():
    ref_rff = _ref_rff()

    from ti_tpu.gedmd.rff import sample_rff_gaussian, spectral_analysis_rff_koopman

    rng = np.random.default_rng(8)
    X = rng.standard_normal((1, 2000)).cumsum(axis=1) * 0.01
    Omega = sample_rff_gaussian(2, 1, 25, 0.8)
    d_ref, _, _ = ref_rff.spectral_analysis_rff_koopman([X], Omega, 5, 3, tol=1e-4)
    d_ours, _ = spectral_analysis_rff_koopman([X], Omega, lag=5, nev=3, tol=1e-4)
    np.testing.assert_allclose(
        np.sort_complex(d_ours), np.sort_complex(d_ref), rtol=1e-5, atol=1e-7
    )


# ---------------------------------------------------------------------------
# embeddings (the extrapolation-sensitive normalization)
# ---------------------------------------------------------------------------


def _ref_embedding():
    """Import the reference embedding module.

    It needs (a) a torch_geometric stub — the real package is not in this
    image and the module only uses it for type annotations — and (b)
    /root/reference/mdqm9 on sys.path because it imports
    `thermo.ambient.models` relative to the mdqm9 root."""
    import importlib
    import types

    if "torch_geometric" not in sys.modules:
        tg = types.ModuleType("torch_geometric")
        tg_data = types.ModuleType("torch_geometric.data")
        tg_data.Batch = type("Batch", (), {})
        tg_data.Data = type("Data", (), {})
        tg.data = tg_data
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.data"] = tg_data
    mdqm9_root = os.path.join(REF, "mdqm9")
    if mdqm9_root not in sys.path:
        sys.path.insert(0, mdqm9_root)
    return importlib.import_module("mdqm9.thermo.ambient.models.embedding")


def test_positional_encoder_golden():
    import torch

    RefPE = _ref_embedding().PositionalEncoder

    from ti_tpu.models.embeddings import positional_encoding

    rng = np.random.default_rng(9)
    x = rng.uniform(0.0, 1.0, (40,)).astype(np.float32)
    for dim, max_length in [(8, 1.0), (16, 10.0), (100, 100.0)]:
        ref = RefPE(dim, max_length)
        out_ref = ref(torch.tensor(x)).numpy()
        out_ours = np.asarray(positional_encoding(x, dim, max_length))
        np.testing.assert_allclose(out_ours, out_ref, rtol=1e-5, atol=1e-6)


def test_temperature_encoder_golden():
    """Center-by-mean-of-known-temps + scale-by-range normalization
    (mdqm9/thermo/ambient/models/embedding.py:184-212) — the part that
    makes leave-one-T-out extrapolation work; must match elementwise,
    including at a temperature OUTSIDE the known list."""
    import torch

    RefTE = _ref_embedding().TemperatureEncoder

    from ti_tpu.models.embeddings import temperature_encoding

    temps = [300.0, 400.0, 500.0, 700.0, 800.0, 900.0, 1000.0]  # no 600
    ref = RefTE(n_features=100, max_length=100.0, temperatures=temps)
    T = np.array([300.0, 600.0, 1000.0, 450.0], dtype=np.float32)
    out_ref = ref(torch.tensor(T)).numpy()
    out_ours = np.asarray(temperature_encoding(T, 100, 100.0, temps))
    np.testing.assert_allclose(out_ours, out_ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# mol_geometry primitives
# ---------------------------------------------------------------------------


def test_mol_geometry_primitives_golden():
    import torch

    from mdqm9.analysis.utils import mol_geometry as ref_geo

    from ti_tpu.analysis import zmatrix as our_geo

    rng = np.random.default_rng(10)
    x1, x2, x3, x4 = (rng.standard_normal((50, 3)).astype(np.float32) * 2 for _ in range(4))
    t = lambda a: torch.tensor(a)
    np.testing.assert_allclose(
        np.asarray(our_geo.compute_distance(x1, x2)),
        ref_geo.compute_distance(t(x1), t(x2)).numpy(), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(our_geo.compute_angle(x1, x2, x3)),
        ref_geo.compute_angle(t(x1), t(x2), t(x3)).numpy(), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(our_geo.compute_torsion(x1, x2, x3, x4)),
        ref_geo.compute_torsion(t(x1), t(x2), t(x3), t(x4)).numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_ic_to_xyz_golden():
    """Atom placement AND the |det J| factor: the reference computes
    det of an easy-to-compute matrix (mol_geometry.py:131-144); ours is
    the analytic d^2 sin form — same absolute value."""
    import torch

    from mdqm9.analysis.utils import mol_geometry as ref_geo

    from ti_tpu.analysis import zmatrix as our_geo

    rng = np.random.default_rng(11)
    p1, p2, p3 = (rng.standard_normal((30, 3)).astype(np.float32) * 2 for _ in range(3))
    d = rng.uniform(0.8, 2.0, (30,)).astype(np.float32)
    ang = rng.uniform(0.3, np.pi - 0.3, (30,)).astype(np.float32)
    tor = rng.uniform(-np.pi + 0.1, np.pi - 0.1, (30,)).astype(np.float32)
    t = lambda a: torch.tensor(a)
    pos_ref, det_ref = ref_geo.ic_to_xyz(
        t(p1), t(p2), t(p3), t(d), t(ang), t(tor), jacobian=True
    )
    pos_ours, det_ours = our_geo.ic_to_xyz(p1, p2, p3, d, ang, tor)
    np.testing.assert_allclose(np.asarray(pos_ours), pos_ref.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(det_ours), np.abs(det_ref.numpy()), rtol=1e-4, atol=1e-5
    )


# ---------------------------------------------------------------------------
# ADW analysis weights
# ---------------------------------------------------------------------------


def test_adw_calculate_weights_golden():
    from adw.analysis import reweight_gedmd as ref_rw

    from ti_tpu.analysis.reweight import calculate_weights
    from ti_tpu.analysis.weights import weights_filter_iqr

    rng = np.random.default_rng(12)
    n_step, n = 5, 400
    initial = rng.standard_normal(n).astype(np.float64)
    target_traj = rng.standard_normal((n_step, n))
    dlogps = rng.standard_normal((n_step, n)) * 0.3
    beta = 1.25

    ref_E0 = ref_rw.calculate_energy(initial)
    ref_E1 = ref_rw.calculate_energy(target_traj[-1])
    ref_logw = 1.0 * ref_E0 - beta * ref_E1 - dlogps[-1]
    x1_ours, w_ours = calculate_weights(initial, target_traj, dlogps, beta)
    np.testing.assert_allclose(x1_ours, target_traj[-1])
    np.testing.assert_allclose(w_ours, np.exp(ref_logw), rtol=1e-10)

    # IQR filter parity on a spread-out weight vector (reference
    # weights_filter_iqr uses strict bounds; ours inclusive — interior
    # points classify identically)
    keep_ref = ref_rw.weights_filter_iqr(w_ours)
    keep_ours = weights_filter_iqr(w_ours)
    np.testing.assert_array_equal(keep_ours, keep_ref)


# ---------------------------------------------------------------------------
# gEDMD util layer
# ---------------------------------------------------------------------------


def test_gedmd_filter_ev_split_by_lag_golden():
    from gedmd import util as ref_util

    from ti_tpu.gedmd.rff import filter_ev, split_by_lag

    rng = np.random.default_rng(13)
    d = rng.standard_normal(12) + 1j * rng.standard_normal(12)
    W = rng.standard_normal((7, 12))
    d_ref, W_ref = ref_util.filter_ev(d.copy(), W.copy(), eps1=-1.0, eps2=0.8)
    d_ours, W_ours = filter_ev(d, W, eps1=-1.0, eps2=0.8)
    np.testing.assert_array_equal(d_ours, d_ref)
    np.testing.assert_array_equal(W_ours, W_ref)

    X1 = rng.standard_normal((3, 50))
    X2 = rng.standard_normal((3, 40))
    for inp in [X1, [X1, X2]]:
        X_ref, Y_ref = ref_util.split_by_lag(inp, 7)
        X_ours, Y_ours = split_by_lag(inp, 7)
        np.testing.assert_array_equal(X_ours, X_ref)
        np.testing.assert_array_equal(Y_ours, Y_ref)


def test_sym2numeric_golden():
    import sympy

    from gedmd.util import Sym2numeric as RefSym

    from ti_tpu.gedmd.symbolic import SymbolicBasis

    x, y = sympy.symbols("x y")
    psi = [x**2 * y, sympy.sin(x) + sympy.cos(y), sympy.exp(-(x**2 + y**2) / 2), x * y + 1]
    ref = RefSym(psi, [x, y], ndiff=2)
    ours = SymbolicBasis(psi, [x, y], ndiff=2)

    rng = np.random.default_rng(14)
    pts = rng.uniform(-1.5, 1.5, (2, 25))
    np.testing.assert_allclose(ours(pts), ref(pts), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ours.diff(pts), ref.diff(pts), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ours.ddiff(pts), ref.ddiff(pts), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# atom ordering (rings — the chemistry-aware logic)
# ---------------------------------------------------------------------------


def _ref_sort_atoms():
    """Import the reference sort_atoms under an rdkit stub: the module only
    calls GetNumAtoms/GetAdjacencyMatrix/RenumberAtoms, all trivially
    reproduced on a plain adjacency-matrix 'molecule'."""
    import importlib
    import types

    if "rdkit" not in sys.modules:
        class _FakeMol:
            def __init__(self, adj):
                self.adj = np.asarray(adj)

            def GetNumAtoms(self):
                return self.adj.shape[0]

        chem = types.ModuleType("rdkit.Chem")
        chem.GetAdjacencyMatrix = lambda mol: np.asarray(mol.adj)
        # rdkit convention: newOrder[i] = original index placed at position i
        chem.RenumberAtoms = lambda mol, order: _FakeMol(
            mol.adj[np.ix_(list(order), list(order))]
        )
        chem._FakeMol = _FakeMol
        rdkit = types.ModuleType("rdkit")
        rdkit.Chem = chem
        sys.modules["rdkit"] = rdkit
        sys.modules["rdkit.Chem"] = chem
    mdqm9_root = os.path.join(REF, "mdqm9")
    if mdqm9_root not in sys.path:
        sys.path.insert(0, mdqm9_root)
    mod = importlib.import_module("mdqm9.analysis.utils.sort_atoms")
    return mod, sys.modules["rdkit"].Chem._FakeMol


def _topologies():
    """(name, n_atoms, bond list) fixtures including the ring cases the
    reference handles (sort_atoms.py:61-213)."""
    # benzene-like: 6-ring, one terminal H per ring atom
    ring6 = [(i, (i + 1) % 6) for i in range(6)] + [(i, 6 + i) for i in range(6)]
    # fused bicyclic (naphthalene-like): two 6-rings sharing an edge + H's
    fused = (
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0),
         (4, 6), (6, 7), (7, 8), (8, 9), (9, 5)]
        + [(i, 10 + j) for j, i in enumerate([0, 1, 2, 3, 6, 7, 8, 9])]
    )
    # ring + branch: cyclopentane ring with an ethyl-like tail
    ring_branch = (
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 5), (5, 6)]
        + [(1, 7), (2, 8), (3, 9), (4, 10), (5, 11), (6, 12), (6, 13)]
    )
    chain = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (3, 6)]
    return [
        ("ring6", 12, ring6),
        ("fused", 18, fused),
        ("ring_branch", 14, ring_branch),
        ("chain", 7, chain),
    ]


@pytest.mark.parametrize("name,n,bonds", _topologies())
def test_sort_atoms_golden(name, n, bonds):
    ref_mod, FakeMol = _ref_sort_atoms()

    from ti_tpu.analysis.sort_atoms import (
        adjacency_from_bonds,
        compute_atom_order_and_references_groups,
    )

    adj = adjacency_from_bonds(n, np.asarray(bonds).T)
    order_ref, groups_ref, refs_ref = ref_mod.compute_atom_order_and_references_groups(
        FakeMol(adj)
    )
    order_ours, groups_ours, refs_ours = compute_atom_order_and_references_groups(adj)
    assert [int(i) for i in order_ours] == [int(i) for i in order_ref]
    assert [[int(a) for a in g] for g in groups_ours] == [
        [int(a) for a in g] for g in groups_ref
    ]
    norm = lambda refs: [[None if v is None else int(v) for v in row] for row in refs]
    assert norm(refs_ours) == norm(refs_ref)


# ---------------------------------------------------------------------------
# models: the ACTUAL reference networks, weight-mapped
# ---------------------------------------------------------------------------


def test_fcnet_reference_model_golden():
    """ti_tpu FCNetMultiBeta on weights imported from the ACTUAL reference
    class (adw/thermo/models/simple.py:5-41) matches its forward output."""
    import jax
    import jax.numpy as jnp
    import torch

    from adw.thermo.models.simple import FCNetMultiBeta as RefFCNet

    from ti_tpu.models.mlp import FCNetMultiBeta
    from ti_tpu.utils.torch_import import fcnet_params_from_torch

    hid, layers = 24, 3
    torch.manual_seed(6)
    ref = RefFCNet(in_size=1, out_size=1, hidden_size=hid, num_layers=layers)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, fcnet_params_from_torch(sd, num_layers=layers))
    model = FCNetMultiBeta(hidden_size=hid, num_layers=layers)

    rng = np.random.default_rng(15)
    x = rng.standard_normal((32, 1)).astype(np.float32)
    t = rng.uniform(0, 1, (32, 1)).astype(np.float32)
    b0 = np.full((32, 1), 1.0, np.float32)
    b1 = np.full((32, 1), 1.5, np.float32)
    ours = np.asarray(
        model.apply(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(b0), jnp.asarray(b1))
    )
    with torch.no_grad():
        theirs = ref(
            torch.tensor(x),  # x0s arg: accepted but unused (simple.py:38)
            torch.tensor(x), torch.tensor(t), torch.tensor(b0), torch.tensor(b1),
        ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


class _FakeBatch:
    """Minimal PyG-Batch stand-in: attribute store with clone and
    getitem/setitem aliasing attributes (what the reference modules use)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __getitem__(self, k):
        return getattr(self, k)

    def __setitem__(self, k, v):
        setattr(self, k, v)

    def clone(self):
        import torch

        new = _FakeBatch()
        for k, v in self.__dict__.items():
            new.__dict__[k] = v.clone() if torch.is_tensor(v) else v
        return new


def _ref_cpainn():
    """Import the reference ambient cPaiNN under functional stubs:
    torch_scatter.scatter -> index_add (sum over dim 0, exactly what
    cpainn.py:228-229,303-304 uses), torch_geometric -> annotation stub."""
    import importlib
    import types

    import torch

    if "torch_scatter" not in sys.modules:
        def scatter(src, index, dim=0, dim_size=None, reduce="sum"):
            assert dim == 0 and reduce in ("sum", "add")
            n = int(index.max()) + 1 if dim_size is None else dim_size
            out = torch.zeros((n,) + tuple(src.shape[1:]), dtype=src.dtype)
            return out.index_add(0, index, src)

        ts = types.ModuleType("torch_scatter")
        ts.scatter = scatter
        sys.modules["torch_scatter"] = ts
    _ref_embedding()  # torch_geometric stub + mdqm9 root on sys.path
    return importlib.import_module("mdqm9.thermo.ambient.models.cpainn")


def test_cpainn_reference_model_golden():
    """flax CPaiNN on weights state_dict()-imported from the ACTUAL
    reference cPaiNN matches the reference's own forward pass elementwise
    (f64 both sides) on a complete molecular graph — closes the gap between
    'torch restatement' parity and true reference parity."""
    import jax
    import jax.numpy as jnp
    import torch

    ref_mod = _ref_cpainn()

    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.models.cpainn import CPaiNN, MolGraph
    from ti_tpu.utils.torch_import import cpainn_params_from_torch

    F, layers, n_atoms = 16, 2, 6
    old_dtype = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        torch.manual_seed(7)
        ref = ref_mod.cPaiNN(
            n_features=F, score_layers=layers, n_types=25,
            temp_length=10, time_length=10,
        )
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

        mol = make_synthetic_molecule(n_atoms=n_atoms, seed=0)
        template = graph_template(mol, t_cond=2)
        rng = np.random.default_rng(16)
        x = 0.3 * rng.standard_normal((n_atoms, 3))
        T0, T1, t_val = 1000.0, 300.0, 0.37

        atoms_t = torch.tensor(np.asarray(template.atom_ids), dtype=torch.long)
        batch = _FakeBatch(
            x=torch.tensor(x),
            atoms=atoms_t,
            edge_index=torch.stack([
                torch.tensor(np.asarray(template.edges.src), dtype=torch.long),
                torch.tensor(np.asarray(template.edges.dst), dtype=torch.long),
            ]),
            edge_type=torch.tensor(
                np.asarray(template.edges.edge_type), dtype=torch.long
            ),
            T0=torch.full((n_atoms,), T0),
            T1=torch.full((n_atoms,), T1),
            t=torch.full((n_atoms,), t_val),
        )
        with torch.no_grad():
            out_ref = ref(batch).output.numpy()
    finally:
        torch.set_default_dtype(old_dtype)

    params = cpainn_params_from_torch(sd, score_layers=layers, conditioning="ambient")
    model = CPaiNN(
        n_features=F, score_layers=layers, conditioning="ambient",
        temp_length=10.0,
    )
    with jax.enable_x64(True):
        params64 = {
            "params": jax.tree.map(
                lambda a: jnp.asarray(np.asarray(a), jnp.float64), params["params"]
            )
        }
        out_ours = np.asarray(
            model.apply(
                params64,
                MolGraph(
                    x=jnp.asarray(x, jnp.float64),
                    atom_ids=template.atom_ids,
                    t=jnp.asarray(t_val, jnp.float64),
                    temps=jnp.asarray([T0, T1], jnp.float64),
                    edges=template.edges,
                ),
            )
        )
    np.testing.assert_allclose(out_ours, out_ref, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("conditioning", ["latent", "none"])
def test_cpainn_latent_reference_model_golden(conditioning):
    """Same true-reference parity for the latent-family cPaiNN (single-T
    or unconditioned; feature keys atom_number/T, latent/models/cpainn.py:43-92).
    The reference's parameter-free AddEquivariantFeatures hardcodes f32
    zeros (latent/models/graph.py:122-124); it is swapped for an f64
    equivalent so both sides can compare in f64."""
    import importlib

    import jax
    import jax.numpy as jnp
    import torch

    _ref_cpainn()  # install stubs + path
    ref_mod = importlib.import_module("mdqm9.thermo.latent.models.cpainn")

    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.models.cpainn import CPaiNN, MolGraph
    from ti_tpu.utils.torch_import import cpainn_params_from_torch

    F, layers, n_atoms = 16, 2, 6
    temps_list = [300, 400, 500, 600, 700, 800, 900, 1000] if conditioning == "latent" else [500]
    old_dtype = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        torch.manual_seed(8)
        ref = ref_mod.cPaiNN(
            n_features=F, score_layers=layers, n_types=25,
            temp_length=10, time_length=10, temperatures=temps_list,
        )

        class _AddEqF64(torch.nn.Module):
            def forward(self, batch):
                batch.equivariant_node_features = torch.zeros(
                    batch.batch.shape[0], F, 3, dtype=torch.float64
                )
                return batch

        assert type(ref.net[1]).__name__ == "AddEquivariantFeatures"
        ref.net[1] = _AddEqF64()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

        mol = make_synthetic_molecule(n_atoms=n_atoms, seed=1)
        n_cond = 1 if conditioning == "latent" else 0
        template = graph_template(mol, t_cond=n_cond)
        rng = np.random.default_rng(17)
        x = 0.3 * rng.standard_normal((n_atoms, 3))
        T, t_val = 700.0, 0.61

        batch = _FakeBatch(
            x=torch.tensor(x),
            atom_number=torch.tensor(np.asarray(template.atom_ids), dtype=torch.long),
            batch=torch.zeros(n_atoms, dtype=torch.long),
            edge_index=torch.stack([
                torch.tensor(np.asarray(template.edges.src), dtype=torch.long),
                torch.tensor(np.asarray(template.edges.dst), dtype=torch.long),
            ]),
            edge_type=torch.tensor(
                np.asarray(template.edges.edge_type), dtype=torch.long
            ),
            T=torch.full((n_atoms,), T),
            t=torch.full((n_atoms,), t_val),
        )
        with torch.no_grad():
            out_ref = ref(batch).output.numpy()
    finally:
        torch.set_default_dtype(old_dtype)

    params = cpainn_params_from_torch(sd, score_layers=layers, conditioning=conditioning)
    model = CPaiNN(
        n_features=F, score_layers=layers, conditioning=conditioning,
        temp_length=10.0, temperatures=tuple(float(v) for v in temps_list),
    )
    with jax.enable_x64(True):
        params64 = {
            "params": jax.tree.map(
                lambda a: jnp.asarray(np.asarray(a), jnp.float64), params["params"]
            )
        }
        out_ours = np.asarray(
            model.apply(
                params64,
                MolGraph(
                    x=jnp.asarray(x, jnp.float64),
                    atom_ids=template.atom_ids,
                    t=jnp.asarray(t_val, jnp.float64),
                    temps=jnp.asarray([T] if conditioning == "latent" else [], jnp.float64),
                    edges=template.edges,
                ),
            )
        )
    np.testing.assert_allclose(out_ours, out_ref, rtol=1e-8, atol=1e-10)


# ---------------------------------------------------------------------------
# training losses (randomness pinned through torch.rand/randn)
# ---------------------------------------------------------------------------


def _import_adw_losses():
    """adw/thermo/losses.py does `import thermo.utils` — but 'thermo' is
    also mdqm9's package name (the reference runs the two stacks from
    different cwds). Swap the 'thermo' namespace to adw's for the import,
    then restore, so test order doesn't matter."""
    import importlib

    adw_root = os.path.join(REF, "adw")
    mdqm9_root = os.path.join(REF, "mdqm9")
    saved = {
        k: sys.modules[k]
        for k in list(sys.modules)
        if k == "thermo" or k.startswith("thermo.")
    }
    for k in saved:
        del sys.modules[k]
    # adw/thermo is a NAMESPACE package (no __init__.py) while mdqm9/thermo
    # is a regular one — a regular package anywhere on sys.path outranks an
    # earlier namespace package, so mdqm9_root must leave the path entirely
    saved_path = list(sys.path)
    sys.path.insert(0, adw_root)
    while mdqm9_root in sys.path:
        sys.path.remove(mdqm9_root)
    try:
        return importlib.import_module("adw.thermo.losses")
    finally:
        sys.path[:] = saved_path
        for k in list(sys.modules):
            if k == "thermo" or k.startswith("thermo."):
                del sys.modules[k]
        sys.modules.update(saved)


def test_adw_loss_golden(monkeypatch):
    """Our ADW antithetic loss == the reference StandardVelocityLoss given
    the same (t, z) draws and the same analytic velocity field."""
    import jax
    import jax.numpy as jnp
    import torch

    from adw.thermo.interpolants import LinearInterpolant as RefInterp

    RefLoss = _import_adw_losses().StandardVelocityLoss

    from ti_tpu.interpolants import linear
    from ti_tpu.losses import adw_velocity_loss

    rng = np.random.default_rng(18)
    B = 64
    x0 = rng.standard_normal((B, 1))
    x1 = rng.standard_normal((B, 1))
    t = rng.uniform(0.05, 0.95, (B, 1))
    z = rng.standard_normal((B, 1))
    b0 = np.full((B, 1), 1.0)
    b1 = np.full((B, 1), 1.25)

    monkeypatch.setattr(
        torch, "rand", lambda *s, **k: torch.tensor(t, dtype=torch.float64)
    )
    monkeypatch.setattr(
        torch, "randn", lambda *s, **k: torch.tensor(z, dtype=torch.float64)
    )

    def b_torch(x0s, xts, ts, beta0s, beta1s):
        return torch.sin(xts) + ts * (beta1s - beta0s) + 0.1 * xts**2

    # RefInterp stores a = torch.tensor(a) in the DEFAULT dtype
    # (adw/thermo/interpolants.py:87) — construct under f64 so the golden
    # comparison is f64 end to end
    old_dtype = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        ref_loss = RefLoss(RefInterp(a=0.9))
        loss_ref = float(
            ref_loss(
                b_torch,
                torch.tensor(x0, dtype=torch.float64),
                torch.tensor(x1, dtype=torch.float64),
                torch.tensor(b0, dtype=torch.float64),
                torch.tensor(b1, dtype=torch.float64),
            )
        )
    finally:
        torch.set_default_dtype(old_dtype)

    def apply_fn(params, xt, tt, bb0, bb1):
        return jnp.sin(xt) + tt * (bb1 - bb0) + 0.1 * xt**2

    with jax.enable_x64(True):
        loss_ours = float(
            adw_velocity_loss(
                apply_fn, None, jax.random.PRNGKey(0),
                jnp.asarray(x0), jnp.asarray(x1),
                jnp.asarray(b0), jnp.asarray(b1),
                linear(a=0.9, gamma="brownian"),
                t=jnp.asarray(t), z=jnp.asarray(z),
            )
        )
    assert loss_ours == pytest.approx(loss_ref, rel=1e-10)


def test_molecular_loss_golden(monkeypatch):
    """Our molecular antithetic loss == the full reference ambient
    StandardVelocityLoss (batch surgery, global centering, per-atom vmap,
    ambient/losses.py:30-133) with the SAME weight-mapped reference cPaiNN
    and pinned (t, z) — end-to-end training-objective parity."""
    import types

    import jax
    import jax.numpy as jnp
    import torch

    ref_cpainn_mod = _ref_cpainn()
    from mdqm9.thermo.ambient.interpolants import LinearInterpolant as RefInterp
    from mdqm9.thermo.ambient.losses import StandardVelocityLoss as RefLoss

    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.interpolants import linear
    from ti_tpu.losses import molecular_velocity_loss
    from ti_tpu.models.cpainn import CPaiNN, MolGraph
    from ti_tpu.utils.torch_import import cpainn_params_from_torch

    F, layers, n, B = 16, 2, 6, 2
    T0, T1 = 1000.0, 300.0
    mol = make_synthetic_molecule(n_atoms=n, seed=0)
    template = graph_template(mol, t_cond=2)
    atom_ids = np.asarray(template.atom_ids)
    src, dst = np.asarray(template.edges.src), np.asarray(template.edges.dst)
    etype = np.asarray(template.edges.edge_type)

    rng = np.random.default_rng(19)
    x0 = 0.3 * rng.standard_normal((B, n, 3))
    x1 = 0.3 * rng.standard_normal((B, n, 3))
    t_mol = np.array([0.3, 0.7])
    z = rng.standard_normal((B, n, 3))

    old_dtype = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        torch.manual_seed(20)
        ref_model = ref_cpainn_mod.cPaiNN(
            n_features=F, score_layers=layers, n_types=25,
            temp_length=10, time_length=10,
        )
        sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

        # pinned draws: one torch.rand(1) per molecule, one torch.randn for z
        t_iter = iter(t_mol)
        monkeypatch.setattr(
            torch, "rand",
            lambda *s, **k: torch.tensor([next(t_iter)], dtype=torch.float64),
        )
        monkeypatch.setattr(
            torch, "randn",
            lambda *s, **k: torch.tensor(z.reshape(B * n, 3), dtype=torch.float64),
        )

        # two copies of the molecule flattened PyG-style, edges offset per mol
        batch0 = _FakeBatch(
            x=torch.tensor(x0.reshape(B * n, 3)),
            atoms=torch.tensor(np.tile(atom_ids, B), dtype=torch.long),
            edge_index=torch.stack([
                torch.tensor(np.concatenate([src + k * n for k in range(B)]), dtype=torch.long),
                torch.tensor(np.concatenate([dst + k * n for k in range(B)]), dtype=torch.long),
            ]),
            edge_type=torch.tensor(np.tile(etype, B), dtype=torch.long),
            T=torch.full((B * n,), T0),
        )
        batch0.to_data_list = lambda: [
            types.SimpleNamespace(atoms=torch.zeros(n)) for _ in range(B)
        ]
        batch1 = _FakeBatch(x=torch.tensor(x1.reshape(B * n, 3)), T=torch.full((B * n,), T1))

        ref_loss = RefLoss(RefInterp(a=1.0, gamma="sin2"), t_distr="uniform")
        with torch.no_grad():
            loss_ref = float(ref_loss(batch0, batch1, ref_model))
    finally:
        torch.set_default_dtype(old_dtype)

    params = cpainn_params_from_torch(sd, score_layers=layers, conditioning="ambient")
    model = CPaiNN(
        n_features=F, score_layers=layers, conditioning="ambient", temp_length=10.0
    )
    with jax.enable_x64(True):
        params64 = {
            "params": jax.tree.map(
                lambda a: jnp.asarray(np.asarray(a), jnp.float64), params["params"]
            )
        }
        graph = MolGraph(
            x=jnp.zeros((n, 3), jnp.float64), atom_ids=template.atom_ids,
            t=jnp.asarray(0.0, jnp.float64),
            temps=jnp.asarray([T0, T1], jnp.float64), edges=template.edges,
        )
        loss_ours = float(
            molecular_velocity_loss(
                model.apply, params64, jax.random.PRNGKey(0), graph,
                jnp.asarray(x0), jnp.asarray(x1),
                jnp.asarray(np.tile([[T0, T1]], (B, 1))),
                linear(a=1.0, gamma="sin2"),
                t=jnp.asarray(t_mol), z=jnp.asarray(z),
            )
        )
    assert loss_ours == pytest.approx(loss_ref, rel=1e-10)


# ---------------------------------------------------------------------------
# exact divergence (the dlogp RHS) vs the reference autograd loop
# ---------------------------------------------------------------------------


def test_adw_divergence_golden():
    """divergence_exact (jax.linearize + tangent basis) == the reference's
    per-dimension autograd loop (adw/thermo/models/ode_wrapper.py:54-67)
    on the same weight-mapped FCNet. The reference scales by 1e-2 (its
    torchdiffeq conditioning hack, dropped here) — undone for comparison."""
    import importlib

    import jax
    import jax.numpy as jnp
    import torch

    from adw.thermo.models.simple import FCNetMultiBeta as RefFCNet

    RefODE = importlib.import_module("adw.thermo.models.ode_wrapper").ODEWrapper

    from ti_tpu.models.mlp import FCNetMultiBeta
    from ti_tpu.ops.divergence import value_and_divergence
    from ti_tpu.utils.torch_import import fcnet_params_from_torch

    hid, layers, B = 24, 3, 16
    old_dtype = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        torch.manual_seed(21)
        ref = RefFCNet(in_size=1, out_size=1, hidden_size=hid, num_layers=layers)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

        rng = np.random.default_rng(22)
        x = rng.standard_normal((B, 1))
        t_val = 0.42
        b0 = np.full((B, 1), 1.0)
        b1 = np.full((B, 1), 1.25)

        xs = torch.tensor(x)
        ts = torch.full((B, 1), t_val, dtype=torch.float64)
        div_ref = RefODE.compute_divergence(
            ref, torch.tensor(x), xs, ts,
            torch.tensor(b0), torch.tensor(b1),
        ).detach().numpy() * 1e2  # undo the reference's 1e-2 scaling
    finally:
        torch.set_default_dtype(old_dtype)

    params = fcnet_params_from_torch(sd, num_layers=layers)
    model = FCNetMultiBeta(hidden_size=hid, num_layers=layers)
    with jax.enable_x64(True):
        params64 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float64), params)

        def per_sample(x_i, b0_i, b1_i):
            f = lambda xv: model.apply(
                params64, xv[None, :], jnp.full((1, 1), t_val, jnp.float64),
                b0_i[None, :], b1_i[None, :],
            )[0]
            _, div = value_and_divergence(f, x_i, mode="exact")
            return div

        div_ours = np.asarray(
            jax.vmap(per_sample)(jnp.asarray(x), jnp.asarray(b0), jnp.asarray(b1))
        )
    np.testing.assert_allclose(div_ours, div_ref, rtol=1e-9, atol=1e-11)


def test_molecular_divergence_golden():
    """Exact molecular divergence == the reference's 3N-backward-pass loop
    (mdqm9/thermo/ambient/models/ode_wrapper.py:60-91) on the same
    weight-mapped cPaiNN — the strongest dlogp-convention check available
    without torchdiffeq."""
    import importlib
    import types

    import jax
    import jax.numpy as jnp
    import torch

    ref_cpainn_mod = _ref_cpainn()
    RefODE = importlib.import_module(
        "mdqm9.thermo.ambient.models.ode_wrapper"
    ).ODEWrapper

    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.models.cpainn import CPaiNN, MolGraph
    from ti_tpu.ops.divergence import value_and_divergence
    from ti_tpu.utils.torch_import import cpainn_params_from_torch

    F, layers, n, B = 16, 2, 6, 2
    T0, T1, t_val = 1000.0, 300.0, 0.42
    mol = make_synthetic_molecule(n_atoms=n, seed=0)
    template = graph_template(mol, t_cond=2)
    atom_ids = np.asarray(template.atom_ids)
    src, dst = np.asarray(template.edges.src), np.asarray(template.edges.dst)
    etype = np.asarray(template.edges.edge_type)

    rng = np.random.default_rng(23)
    x = 0.3 * rng.standard_normal((B, n, 3))

    old_dtype = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        torch.manual_seed(24)
        ref_model = ref_cpainn_mod.cPaiNN(
            n_features=F, score_layers=layers, n_types=25,
            temp_length=10, time_length=10,
        )
        sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

        batch = _FakeBatch(
            x=torch.tensor(x.reshape(B * n, 3)),
            atoms=torch.tensor(np.tile(atom_ids, B), dtype=torch.long),
            edge_index=torch.stack([
                torch.tensor(np.concatenate([src + k * n for k in range(B)]), dtype=torch.long),
                torch.tensor(np.concatenate([dst + k * n for k in range(B)]), dtype=torch.long),
            ]),
            edge_type=torch.tensor(np.tile(etype, B), dtype=torch.long),
            T0=torch.full((B * n,), T0),
            T1=torch.full((B * n,), T1),
            t=torch.full((B * n,), t_val),
        )
        # compute_divergence only uses to_data_list for the (B, n, 3) shape
        batch.to_data_list = lambda: [
            types.SimpleNamespace(x=batch.x[k * n : (k + 1) * n]) for k in range(B)
        ]
        div_ref = (
            RefODE.compute_divergence(ref_model, batch).detach().numpy() * 1e2
        )  # undo the reference's 1e-2 scaling (ode_wrapper.py:91)
    finally:
        torch.set_default_dtype(old_dtype)

    params = cpainn_params_from_torch(sd, score_layers=layers, conditioning="ambient")
    model = CPaiNN(
        n_features=F, score_layers=layers, conditioning="ambient", temp_length=10.0
    )
    with jax.enable_x64(True):
        params64 = {
            "params": jax.tree.map(
                lambda a: jnp.asarray(np.asarray(a), jnp.float64), params["params"]
            )
        }
        temps = jnp.asarray([T0, T1], jnp.float64)

        def per_mol(x_m):
            f = lambda xv: model.apply(
                params64,
                MolGraph(
                    x=xv, atom_ids=template.atom_ids,
                    t=jnp.asarray(t_val, jnp.float64), temps=temps,
                    edges=template.edges,
                ),
            )
            _, div = value_and_divergence(f, x_m, mode="exact")
            return div

        div_ours = np.asarray(jax.vmap(per_mol)(jnp.asarray(x)))
    np.testing.assert_allclose(div_ours, div_ref, rtol=1e-9, atol=1e-11)


# ---------------------------------------------------------------------------
# gEDMD cross-validation (splits pinned on both sides)
# ---------------------------------------------------------------------------


def _pinned_perms(m, ntest, seed):
    rng = np.random.default_rng(seed)
    return [rng.permutation(m) for _ in range(ntest)]


def _fake_split(perm_iter):
    """sklearn.train_test_split stand-in that applies OUR permutation
    sequence (same ordering contract: train/test per array in order)."""

    def split(*arrays, train_size):
        perm = next(perm_iter)
        ntr = int(train_size * len(arrays[0]))
        out = []
        for arr in arrays:
            out.append(arr[perm[:ntr]])
            out.append(arr[perm[ntr:]])
        return out

    return split


def _fake_generator(perms):
    """A mock np.random.Generator whose permutation() replays ``perms``
    (passes ti_tpu's isinstance(seed, np.random.Generator) check)."""
    from unittest import mock

    g = mock.MagicMock(spec=np.random.Generator)
    g.permutation = mock.MagicMock(side_effect=list(perms))
    return g


def test_cv_generator_rff_golden(monkeypatch):
    ref_rff = _ref_rff()

    from ti_tpu.gedmd.rff import cv_generator_rff, sample_rff_gaussian

    rng = np.random.default_rng(25)
    X = rng.standard_normal((1, 1500))
    Omega = sample_rff_gaussian(3, 1, 30, 0.7)
    ntest, nev, rtrain = 3, 4, 0.75

    perms = _pinned_perms(X.shape[1], ntest, seed=26)
    monkeypatch.setattr(ref_rff, "train_test_split", _fake_split(iter(perms)))
    d_ref, scores_ref = ref_rff.cv_generator_rff(
        X, Omega, a=2.0, rtrain=rtrain, ntest=ntest, nev=nev, tol=1e-6
    )

    d_ours, scores_ours = cv_generator_rff(
        X, Omega, a=2.0, rtrain=rtrain, ntest=ntest, nev=nev, tol=1e-6,
        seed=_fake_generator(perms),
    )
    np.testing.assert_allclose(d_ours, np.real(d_ref), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(scores_ours, scores_ref, rtol=1e-7, atol=1e-9)


def test_cv_koopman_rff_golden(monkeypatch):
    ref_rff = _ref_rff()

    from ti_tpu.gedmd.rff import cv_koopman_rff, sample_rff_gaussian

    rng = np.random.default_rng(27)
    X = rng.standard_normal((1, 1200)).cumsum(axis=1) * 0.02
    Omega = sample_rff_gaussian(4, 1, 25, 0.8)
    lag, ntest, nev, rtrain = 5, 3, 3, 0.7

    m_pairs = X.shape[1] - lag
    perms = _pinned_perms(m_pairs, ntest, seed=28)
    monkeypatch.setattr(ref_rff, "train_test_split", _fake_split(iter(perms)))
    d_ref, scores_ref = ref_rff.cv_koopman_rff(
        X, Omega, lag, rtrain=rtrain, ntest=ntest, nev=nev, tol=1e-6
    )

    d_ours, scores_ours = cv_koopman_rff(
        X, Omega, lag, rtrain=rtrain, ntest=ntest, nev=nev, tol=1e-6,
        seed=_fake_generator(perms),
    )
    np.testing.assert_allclose(
        np.sort_complex(d_ours.ravel()), np.sort_complex(d_ref.ravel()),
        rtol=1e-6, atol=1e-8,
    )
    np.testing.assert_allclose(scores_ours, scores_ref, rtol=1e-6, atol=1e-8)


def test_latent_loss_golden(monkeypatch):
    """Our one-sided molecular loss == the reference latent
    OneSidedVelocityLoss (latent/losses.py:30-121) with the weight-mapped
    latent cPaiNN and pinned per-molecule t. The reference's dead x_t^-
    forward (its value is never used) is skipped on our side by design."""
    import importlib
    import types

    import jax
    import jax.numpy as jnp
    import torch

    _ref_cpainn()
    ref_mod = importlib.import_module("mdqm9.thermo.latent.models.cpainn")
    from mdqm9.thermo.latent.interpolants import (
        OneSidedLinearInterpolant as RefInterp,
    )
    from mdqm9.thermo.latent.losses import OneSidedVelocityLoss as RefLoss

    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.interpolants import one_sided_linear
    from ti_tpu.losses import molecular_velocity_loss
    from ti_tpu.models.cpainn import CPaiNN, MolGraph
    from ti_tpu.utils.torch_import import cpainn_params_from_torch

    F, layers, n, B = 16, 2, 6, 2
    T = 500.0
    temps_list = [300, 400, 500, 600, 700, 800, 900, 1000]
    mol = make_synthetic_molecule(n_atoms=n, seed=2)
    template = graph_template(mol, t_cond=1)
    atom_ids = np.asarray(template.atom_ids)
    src, dst = np.asarray(template.edges.src), np.asarray(template.edges.dst)
    etype = np.asarray(template.edges.edge_type)

    rng = np.random.default_rng(29)
    x0 = rng.standard_normal((B, n, 3))  # noise endpoint
    x1 = 0.3 * rng.standard_normal((B, n, 3))
    t_mol = np.array([0.25, 0.8])

    old_dtype = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        torch.manual_seed(30)
        ref_model = ref_mod.cPaiNN(
            n_features=F, score_layers=layers, n_types=25,
            temp_length=10, time_length=10, temperatures=temps_list,
        )

        class _AddEqF64(torch.nn.Module):
            def forward(self, batch):
                batch.equivariant_node_features = torch.zeros(
                    batch.batch.shape[0], F, 3, dtype=torch.float64
                )
                return batch

        assert type(ref_model.net[1]).__name__ == "AddEquivariantFeatures"
        ref_model.net[1] = _AddEqF64()
        sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

        t_iter = iter(t_mol)
        monkeypatch.setattr(
            torch, "rand",
            lambda *s, **k: torch.tensor([next(t_iter)], dtype=torch.float64),
        )

        batch = _FakeBatch(
            x0=torch.tensor(x0.reshape(B * n, 3)),
            x1=torch.tensor(x1.reshape(B * n, 3)),
            atom_number=torch.tensor(np.tile(atom_ids, B), dtype=torch.long),
            batch=torch.repeat_interleave(torch.arange(B), n),
            edge_index=torch.stack([
                torch.tensor(np.concatenate([src + k * n for k in range(B)]), dtype=torch.long),
                torch.tensor(np.concatenate([dst + k * n for k in range(B)]), dtype=torch.long),
            ]),
            edge_type=torch.tensor(np.tile(etype, B), dtype=torch.long),
            T=torch.full((B * n,), T),
        )
        batch.to_data_list = lambda: [
            types.SimpleNamespace(atom_number=torch.zeros(n)) for _ in range(B)
        ]
        ref_loss = RefLoss(RefInterp(), t_distr="uniform")
        with torch.no_grad():
            loss_ref = float(ref_loss(batch, ref_model))
    finally:
        torch.set_default_dtype(old_dtype)

    params = cpainn_params_from_torch(sd, score_layers=layers, conditioning="latent")
    model = CPaiNN(
        n_features=F, score_layers=layers, conditioning="latent",
        temp_length=10.0, temperatures=tuple(float(v) for v in temps_list),
    )
    with jax.enable_x64(True):
        params64 = {
            "params": jax.tree.map(
                lambda a: jnp.asarray(np.asarray(a), jnp.float64), params["params"]
            )
        }
        graph = MolGraph(
            x=jnp.zeros((n, 3), jnp.float64), atom_ids=template.atom_ids,
            t=jnp.asarray(0.0, jnp.float64), temps=jnp.asarray([T], jnp.float64),
            edges=template.edges,
        )
        loss_ours = float(
            molecular_velocity_loss(
                model.apply, params64, jax.random.PRNGKey(0), graph,
                jnp.asarray(x0), jnp.asarray(x1),
                jnp.asarray(np.full((B, 1), T)),
                one_sided_linear(),
                t=jnp.asarray(t_mol),
            )
        )
    assert loss_ours == pytest.approx(loss_ref, rel=1e-10)
