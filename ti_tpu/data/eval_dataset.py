"""MDQM9 evaluation dataset: hdf5 + SDF reader for the energy/analysis stage.

Counterpart of the reference MDQM9EvalDataset
(mdqm9/analysis/utils/eval_dataset.py:18-53): per-molecule records with
partial charges, reference atoms, groups and MD/replica trajectories from
the curated hdf5, plus the molecule structure from the SDF. h5py lives in
the separate energy environment (ti_energy_env.yml), so this module is
import-gated the same way the OpenMM stage is.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ti_tpu.data.sdf import Molecule, parse_sdf_v2000


@dataclasses.dataclass
class EvalRecord:
    mol: Molecule
    atoms: np.ndarray
    partial_charges: np.ndarray
    ref_atoms: Optional[np.ndarray]
    groups: Optional[np.ndarray]
    md_trajs: Optional[np.ndarray]
    re_trajs: Optional[np.ndarray]


class MDQM9EvalDataset:
    """Indexable reader over (hdf5, sdf) like the reference class."""

    def __init__(self, hdf5_path: str, sdf_path: str):
        try:
            import h5py  # noqa: PLC0415
        except ImportError as e:  # pragma: no cover - not in TPU image
            raise ImportError(
                "h5py is not available in this image; the eval dataset is "
                "part of the separate energy-evaluation environment "
                "(reference ti_energy_env.yml). Run this stage there."
            ) from e
        self._h5 = h5py.File(hdf5_path, "r")
        self._sdf_path = sdf_path

    def __len__(self) -> int:
        return len(self._h5.keys())

    @staticmethod
    def _get(group, key):
        return np.asarray(group[key]) if key in group else None

    def __getitem__(self, idx: int) -> EvalRecord:
        key = f"{idx:05d}" if f"{idx:05d}" in self._h5 else list(self._h5.keys())[idx]
        g = self._h5[key]
        return EvalRecord(
            mol=parse_sdf_v2000(self._sdf_path, idx),
            atoms=self._get(g, "atoms"),
            partial_charges=self._get(g, "partial_charges"),
            ref_atoms=self._get(g, "ref_atoms"),
            groups=self._get(g, "groups"),
            md_trajs=self._get(g, "md_trajs"),
            re_trajs=self._get(g, "re_trajs"),
        )

    def close(self):
        self._h5.close()
