from ti_tpu.ops.divergence import divergence_exact, divergence_hutchinson, value_and_divergence
from ti_tpu.ops.graph import complete_graph_edges, edge_aggregate, make_edge_table
from ti_tpu.ops.kabsch import kabsch_align

__all__ = [
    "divergence_exact",
    "divergence_hutchinson",
    "value_and_divergence",
    "complete_graph_edges",
    "edge_aggregate",
    "make_edge_table",
    "kabsch_align",
]
