from .gnngraph import GnnGraph, empty_graph
from .builders import (
    rand_graph,
    complete_digraph,
    radius_graph,
    knn_graph,
    delaunay_graph,
    grid_graph_1d,
    grid_graph_2d,
)
from .transforms import (
    add_self_loops,
    degree,
    sort_by_receiver,
    csr_offsets,
    to_dense_adjacency,
    from_dense_adjacency,
    pad_graph,
)
from .batch import batch, unbatch
from .reorder import (
    rcm_order,
    rcm_reorder,
    morton_order,
    spatial_reorder,
    reorder_graph,
    permute_nodes,
    unpermute_nodes,
    bandwidth,
)

__all__ = [
    "GnnGraph", "empty_graph", "rand_graph", "complete_digraph",
    "radius_graph", "knn_graph", "delaunay_graph", "grid_graph_1d",
    "grid_graph_2d", "add_self_loops", "degree", "sort_by_receiver",
    "csr_offsets", "to_dense_adjacency", "from_dense_adjacency", "pad_graph",
    "batch", "unbatch", "rcm_order", "rcm_reorder", "morton_order",
    "spatial_reorder", "reorder_graph", "permute_nodes", "unpermute_nodes",
    "bandwidth",
]
