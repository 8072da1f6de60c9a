from .partition import (
    PartitionedGraph,
    partition_graph,
    reorder_for_partition,
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
from .layers import (ShardedGCNConv, ShardedVMHConv, ShardedMPPDEConv,
                     ShardedGNOConv, sharded_grand_model)
from .tp import (shard_mlp_params, replicate_params,
                 row_parallel_dense)

__all__ = [
    "PartitionedGraph", "partition_graph", "reorder_for_partition", "pad_node_features",
    "unpad_node_features", "GRAPH_AXIS", "make_mesh", "sharded_spmm",
    "sharded_gcn_forward", "sharded_propagate", "shard_node_features", "replicate",
    "ShardedGCNConv", "ShardedVMHConv", "ShardedMPPDEConv", "ShardedGNOConv",
    "sharded_grand_model",
    "shard_mlp_params", "replicate_params", "row_parallel_dense",
]
