from .partition import (
    PartitionedGraph,
    partition_graph,
    pad_node_features,
    unpad_node_features,
)
from .halo import (
    GRAPH_AXIS,
    make_mesh,
    sharded_spmm,
    sharded_gcn_forward,
    sharded_propagate,
    shard_node_features,
    replicate,
)
from .layers import ShardedGCNConv, ShardedVMHConv, sharded_grand_model

__all__ = [
    "PartitionedGraph", "partition_graph", "pad_node_features",
    "unpad_node_features", "GRAPH_AXIS", "make_mesh", "sharded_spmm",
    "sharded_gcn_forward", "sharded_propagate", "shard_node_features", "replicate",
    "ShardedGCNConv", "ShardedVMHConv", "sharded_grand_model",
]
