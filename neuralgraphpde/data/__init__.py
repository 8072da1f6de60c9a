from .synthetic import (
    NodeClassificationData,
    synthetic_cora,
    random_spmm_graph,
)
from .loaders import cora_dataset, load_cora, load_ogb_nodeprop

__all__ = [
    "NodeClassificationData", "synthetic_cora", "random_spmm_graph",
    "cora_dataset", "load_cora", "load_ogb_nodeprop",
]
