from ti_tpu.data.sdf import parse_sdf_v2000, Molecule
from ti_tpu.data.adw import ADWDataset, make_synthetic_adw_csv
from ti_tpu.data.mdqm9 import (
    MDQM9AmbientDataset,
    MDQM9LatentDataset,
    SCALING_FACTOR,
    SCALING_FACTOR_31,
    SCALING_FACTOR_10506,
    make_synthetic_molecule,
)

__all__ = [
    "parse_sdf_v2000",
    "Molecule",
    "ADWDataset",
    "make_synthetic_adw_csv",
    "MDQM9AmbientDataset",
    "MDQM9LatentDataset",
    "SCALING_FACTOR",
    "SCALING_FACTOR_31",
    "SCALING_FACTOR_10506",
    "make_synthetic_molecule",
]
