from .segment_kernels import (
    TiledCSR,
    build_tiled_csr,
    tiled_segment_spmm,
    set_kernel_compute_dtype,
)
from .gno_kernels import fused_gno_aggregate, pack_last_layer
from .banded_kernels import banded_gcn_rhs, banded_spmm_pallas
from .dia_kernels import dia_gcn_rhs, dia_spmm_pallas
from .fused_mlp_kernels import fused_mlp_aggregate
from .segment_kernels import split_tiled_csr, tiled_segment_spmm_grouped

__all__ = [
    "TiledCSR", "build_tiled_csr", "tiled_segment_spmm",
    "set_kernel_compute_dtype", "fused_gno_aggregate", "pack_last_layer",
    "banded_spmm_pallas", "banded_gcn_rhs", "dia_spmm_pallas", "dia_gcn_rhs",
    "fused_mlp_aggregate", "split_tiled_csr", "tiled_segment_spmm_grouped",
]
