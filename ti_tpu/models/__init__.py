from ti_tpu.models.mlp import FCNetMultiBeta
from ti_tpu.models.cpainn import CPaiNN, MolGraph
from ti_tpu.models.embeddings import MLP, positional_encoding, temperature_encoding

__all__ = [
    "FCNetMultiBeta",
    "CPaiNN",
    "MolGraph",
    "MLP",
    "positional_encoding",
    "temperature_encoding",
]
