"""MDQM9 replica-exchange dataset ingest and batching.

Counterpart of the reference MDQM9 datasets (mdqm9/data/mdqm9_ambient.py,
mdqm9/data/mdqm9_latent.py). Host-side numpy ingest of the
(8, n_frames, n_atoms, 3) per-split trajectory files indexed by temperature
(300..1000 K -> index 0..7, mdqm9_ambient.py:46), COM centering, the
published per-molecule scaling factors, and bond tables from the in-repo
SDF parser — then everything becomes fixed-shape device arrays.

TPU-first differences from the reference:
- graphs are STATIC per molecule (complete graph + bond types via
  ops.graph.make_edge_table) — no per-item radius_graph/coalesce calls
  (the production configs use cutoff=1000 ⇒ complete graphs anyway).
- batching is plain (B, N, 3) arrays + one MolGraph template; no PyG
  bookkeeping. Re-pairing of temperatures across epochs happens by
  independent shuffles of the T0 and T1 datasets, like the reference's
  fresh per-epoch DataLoaders (mdqm9/train_ambient.py:100-117).
- ``make_synthetic_molecule`` fabricates a chemically-plausible chain
  molecule + pseudo-MD frames so the full pipeline runs without the
  (author-request-only) MDQM9 data.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ti_tpu.data.sdf import Molecule, parse_sdf_v2000
from ti_tpu.models.cpainn import MolGraph
from ti_tpu.ops.graph import make_edge_table
from ti_tpu.ops.kabsch import kabsch_align

# Published per-molecule coordinate scalings (mdqm9_ambient.py:14-16)
SCALING_FACTOR = 0.20754094
SCALING_FACTOR_31 = 0.09729941375
SCALING_FACTOR_10506 = 0.13163184188306332

TEMPERATURES = tuple(range(300, 1001, 100))
_TEMP_INDEX = {t: i for i, t in enumerate(TEMPERATURES)}


def scaling_factor_for(traj_filename: str) -> float:
    if "00031" in traj_filename:
        return SCALING_FACTOR_31
    if "10506" in traj_filename:
        return SCALING_FACTOR_10506
    return SCALING_FACTOR


def load_trajs(
    traj_path: str, split: str, traj_filename: str, temperature: int, scale: bool
) -> np.ndarray:
    """(n_frames, n_atoms, 3) frames at one temperature, COM-centered,
    optionally scaled (reference get_mdqm9_trajs, mdqm9_ambient.py:196-207)."""
    trajs = np.load(os.path.join(traj_path, split, traj_filename))[_TEMP_INDEX[temperature]]
    trajs = trajs - trajs.mean(axis=1, keepdims=True)
    if scale:
        trajs = trajs * scaling_factor_for(traj_filename)
    return np.asarray(trajs, dtype=np.float32)


def graph_template(
    mol: Molecule, t_cond: int, atom_id_mode: str = "positional"
) -> MolGraph:
    """Static MolGraph template for one molecule.

    atom_id_mode: "positional" = arange(N) (the 'distinguish' mode both
    reference pipelines actually use, mdqm9_ambient.py:222-229) or
    "element" = atomic numbers.
    """
    n = mol.n_atoms
    edges = make_edge_table(n, mol.bond_index, mol.bond_types)
    ids = np.arange(n) if atom_id_mode == "positional" else mol.atomic_numbers
    return MolGraph(
        x=jnp.zeros((n, 3), dtype=jnp.float32),
        atom_ids=jnp.asarray(ids, dtype=jnp.int32),
        t=jnp.array(0.0, dtype=jnp.float32),
        temps=jnp.zeros((t_cond,), dtype=jnp.float32),
        edges=edges,
    )


@dataclasses.dataclass
class MDQM9AmbientDataset:
    """Frames at a list of temperatures for T0→T1 transport training.

    Two instances (T0s list / T1s list) are zipped with independent
    shuffles each epoch (reference mdqm9/train_ambient.py:73-117).
    """

    frames: np.ndarray  # (n, N, 3) float32, centered (+scaled)
    temps: np.ndarray  # (n,) float32
    mol: Molecule
    template: MolGraph

    @classmethod
    def load(
        cls,
        traj_path: str,
        sdf_path: str,
        traj_filename: str,
        sdf_filename: str = "mdqm9.sdf",
        split: str = "train",
        Ts: Sequence[int] = (300,),
        scale: bool = True,
        mol_index: Optional[int] = None,
    ) -> "MDQM9AmbientDataset":
        if mol_index is None:
            mol_index = int(traj_filename.split(".")[0])
        mol = parse_sdf_v2000(os.path.join(sdf_path, sdf_filename), mol_index)
        data = [load_trajs(traj_path, split, traj_filename, T, scale) for T in Ts]
        temps = np.concatenate([np.full(len(d), T, dtype=np.float32) for d, T in zip(data, Ts)])
        return cls(
            frames=np.concatenate(data, axis=0),
            temps=temps,
            mol=mol,
            template=graph_template(mol, t_cond=2),
        )

    @classmethod
    def from_arrays(cls, frames, temps, mol: Molecule, t_cond: int = 2) -> "MDQM9AmbientDataset":
        return cls(
            frames=np.asarray(frames, np.float32),
            temps=np.asarray(temps, np.float32),
            mol=mol,
            template=graph_template(mol, t_cond=t_cond),
        )

    def __len__(self) -> int:
        return len(self.frames)

    def epoch_batches(self, key, batch_size: int):
        """(n_batches, B, N, 3) frames + (n_batches, B) temps, shuffled."""
        n = len(self)
        nb = n // batch_size
        perm = np.asarray(jax.random.permutation(key, n))[: nb * batch_size]
        x = jnp.asarray(self.frames[perm]).reshape(nb, batch_size, *self.frames.shape[1:])
        t = jnp.asarray(self.temps[perm]).reshape(nb, batch_size)
        return x, t


@dataclasses.dataclass
class MDQM9LatentDataset:
    """Noise→data pairs for the latent (Boltzmann-generator) pipeline.

    x0 ~ N(0, I) COM-removed and optionally Kabsch-aligned onto x1
    (reference mdqm9/data/mdqm9_latent.py:100-105).
    """

    frames: np.ndarray  # (n, N, 3) data (x1)
    temps: np.ndarray  # (n,)
    mol: Molecule
    template: MolGraph
    align: bool = True

    @classmethod
    def load(
        cls,
        traj_path: str,
        sdf_path: str,
        traj_filename: str,
        sdf_filename: str = "mdqm9.sdf",
        split: str = "train",
        Ts: Sequence[int] = (300,),
        scale: bool = True,
        align: bool = True,
        mol_index: Optional[int] = None,
    ) -> "MDQM9LatentDataset":
        if mol_index is None:
            mol_index = int(traj_filename.split(".")[0])
        mol = parse_sdf_v2000(os.path.join(sdf_path, sdf_filename), mol_index)
        data = [load_trajs(traj_path, split, traj_filename, T, scale) for T in Ts]
        temps = np.concatenate([np.full(len(d), T, dtype=np.float32) for d, T in zip(data, Ts)])
        t_cond = 1 if len(Ts) > 1 else 0
        return cls(
            frames=np.concatenate(data, axis=0),
            temps=temps,
            mol=mol,
            template=graph_template(mol, t_cond=t_cond),
            align=align,
        )

    @classmethod
    def from_arrays(
        cls, frames, temps, mol: Molecule, t_cond: int = 1, align: bool = True
    ) -> "MDQM9LatentDataset":
        return cls(
            frames=np.asarray(frames, np.float32),
            temps=np.asarray(temps, np.float32),
            mol=mol,
            template=graph_template(mol, t_cond=t_cond),
            align=align,
        )

    def __len__(self) -> int:
        return len(self.frames)

    def epoch_batches(self, key, batch_size: int):
        """((nb, B, N, 3) x0 noise, (nb, B, N, 3) x1 data, (nb, B) temps)."""
        n = len(self)
        nb = n // batch_size
        pkey, zkey = jax.random.split(key)
        perm = np.asarray(jax.random.permutation(pkey, n))[: nb * batch_size]
        x1 = jnp.asarray(self.frames[perm])
        z = jax.random.normal(zkey, x1.shape, dtype=x1.dtype)
        z = z - z.mean(axis=1, keepdims=True)
        x1c = x1 - x1.mean(axis=1, keepdims=True)
        if self.align:
            z = jax.vmap(kabsch_align)(z, x1c)
        shape = (nb, batch_size, *self.frames.shape[1:])
        return (
            z.reshape(shape),
            x1c.reshape(shape),
            jnp.asarray(self.temps[perm]).reshape(nb, batch_size),
        )

    def sample_noise(self, key, n: int):
        """Pure-noise x0 batches for BG sampling (reference SamplerDataset,
        mdqm9_latent.py:116-205)."""
        z = jax.random.normal(key, (n, *self.frames.shape[1:]), dtype=jnp.float32)
        return z - z.mean(axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# synthetic stand-ins (MDQM9 data is by author request only, README.md:29)
# ---------------------------------------------------------------------------

def make_synthetic_molecule(n_atoms: int = 19, seed: int = 0) -> Molecule:
    """A chain molecule with a few branches — plausible bond graph + geometry."""
    rng = np.random.default_rng(seed)
    # backbone chain 0-1-2-...; every third atom gets a branch if available
    src, dst, types = [], [], []
    pos = np.zeros((n_atoms, 3))
    backbone = list(range(0, n_atoms, 1))
    for i in range(1, n_atoms):
        parent = i - 1 if i % 3 else max(0, i - 2)
        src += [parent, i]
        dst += [i, parent]
        bt = 1 + (i % 2 == 0 and i % 5 == 0)  # sprinkle some double bonds
        types += [bt, bt]
        direction = rng.normal(size=3)
        pos[i] = pos[parent] + 1.5 * direction / np.linalg.norm(direction)
    atoms = rng.choice([1, 6, 7, 8], size=n_atoms, p=[0.5, 0.35, 0.1, 0.05])
    return Molecule(
        atomic_numbers=atoms.astype(np.int64),
        positions=pos,
        bond_index=np.asarray([src, dst], dtype=np.int64),
        bond_types=np.asarray(types, dtype=np.int64),
        name=f"synthetic_{n_atoms}",
    )


def make_synthetic_frames(
    mol: Molecule, n_frames: int, temperature: float, seed: int = 0,
    jitter: float = 0.05,
) -> np.ndarray:
    """Pseudo-MD frames: equilibrium geometry + T-scaled Gaussian jitter
    (sigma = jitter * sqrt(T/300)), COM-centered. Exact Boltzmann samples of
    an isotropic harmonic well — the molecular physics-oracle tests rely on
    this closed form."""
    rng = np.random.default_rng(seed)
    sigma = jitter * np.sqrt(temperature / 300.0)
    frames = mol.positions[None] + sigma * rng.standard_normal((n_frames, mol.n_atoms, 3))
    frames = frames - frames.mean(axis=1, keepdims=True)
    return frames.astype(np.float32)
