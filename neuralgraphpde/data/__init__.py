from .synthetic import (
    NodeClassificationData,
    synthetic_cora,
    random_spmm_graph,
)

__all__ = ["NodeClassificationData", "synthetic_cora", "random_spmm_graph"]
