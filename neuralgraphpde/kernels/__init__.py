from .segment_kernels import (
    TiledCSR,
    build_tiled_csr,
    tiled_segment_spmm,
)

__all__ = ["TiledCSR", "build_tiled_csr", "tiled_segment_spmm"]
