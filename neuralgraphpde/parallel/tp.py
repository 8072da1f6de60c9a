"""Tensor parallelism for the layer MLPs (SURVEY §2.3: secondary strategy).

GNN-PDE models are dominated by edge-batched MLPs (``num_edges × hidden``
GEMMs). When hidden widths are large, shard the *feature* dimension of Dense
kernels over a mesh axis with ``NamedSharding`` and let XLA's SPMD partitioner
insert the collectives — the GSPMD recipe: annotate, jit, let the compiler
place all-gathers/reduce-scatters on the ICI.

Convention: Dense kernels ``(in, out)`` shard on ``out`` (column parallel);
biases ``(1, out)`` likewise. Successive layers then alternate
column-/row-parallel naturally under GSPMD's propagation; no manual
collectives are written here.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_mlp_params(
    params: Any,
    mesh: Mesh,
    axis_name: str = "model",
    min_dim: int = 256,
) -> Any:
    """Place every Dense-like kernel with a large trailing dim column-sharded
    on ``axis_name``; everything else replicated.

    ``min_dim``: only shard output dims at least this large (small layers are
    cheaper replicated than gathered).
    """
    axis_size = mesh.shape[axis_name]

    def place(leaf):
        if (hasattr(leaf, "ndim") and leaf.ndim == 2
                and leaf.shape[-1] >= min_dim
                and leaf.shape[-1] % axis_size == 0):
            return jax.device_put(
                leaf, NamedSharding(mesh, P(None, axis_name)))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, params)


def replicate_params(params: Any, mesh: Mesh) -> Any:
    return jax.device_put(params, NamedSharding(mesh, P()))
