from .segment_kernels import (
    TiledCSR,
    build_tiled_csr,
    tiled_segment_spmm,
    set_kernel_compute_dtype,
)
from .gno_kernels import fused_gno_aggregate, pack_last_layer
from .banded_kernels import banded_spmm_pallas

__all__ = [
    "TiledCSR", "build_tiled_csr", "tiled_segment_spmm",
    "set_kernel_compute_dtype", "fused_gno_aggregate", "pack_last_layer",
    "banded_spmm_pallas",
]
