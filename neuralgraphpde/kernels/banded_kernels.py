"""Pallas TPU kernel for diagonal-banded block SpMM — the mesh hot path.

Spatially ordered PDE meshes (grids; Delaunay/radius graphs after RCM or
Morton reordering, ``graph/reorder.py``) have banded adjacency: every nonzero
block sits on one of a handful of block-diagonals. ``ops/bsr.py`` stores
those diagonals densely (``BandedMatrix``); this kernel turns the aggregation
``out = A @ x`` into a pure streaming matmul with NO per-edge gather at all —
the TPU-native replacement for the reference's NNlib scatter path
(reference src/layers.jl:227-233) on mesh graphs.

Kernel shape (grid = feature-tiles × block-rows × bands, bands fastest):

    out[i] += bands[k, i] @ x[i + offsets[k]]          (f32 accumulate)

- the output block stays resident in VMEM across a row's bands (canonical
  K-loop revisit),
- band blocks and x windows stream HBM→VMEM through the Pallas pipeline
  (auto double-buffered), so the kernel is purely HBM-bandwidth bound,
- boundary rows read a clamped x block; the corresponding band block is
  all-zero by construction (``build_banded`` zero-fills), so no masking is
  needed,
- bf16 band storage halves the dominant traffic; accumulation is f32 on the
  MXU via ``preferred_element_type``.

The XLA einsum formulation (``ops.bsr.banded_spmm``) materializes a shifted
copy of ``x`` plus an f32 partial-sum tensor per band; this kernel removes
both hops (measured ~4x on the 512x512 grid mesh, docs/tpu_design.md).

Backward is the transposed banded product: ``grad_x = A^T @ g``, where
``A^T`` is just the banded matrix of the reversed edges (built once at
``ops.precompute`` time as ``cache['banded_rev']``). Without a prebuilt
reverse, the VJP transposes the bands on the fly (roll + block-transpose).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.bsr import BandedMatrix

TF_MAX = 512


def _banded_kernel(offs_ref, bands_ref, x_ref, out_ref):
    del offs_ref  # consumed by the index maps (scalar prefetch)
    k = pl.program_id(2)  # band index — fastest grid dim

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # f32 operands must request HIGHEST precision: the MXU's default f32
    # matmul truncates inputs to bf16 (measured 2e-2 error on-chip); bf16
    # band storage is the explicit speed path.
    prec = (jax.lax.Precision.HIGHEST
            if bands_ref.dtype == jnp.float32 else None)
    out_ref[:] += jnp.dot(bands_ref[0, 0], x_ref[:],
                          preferred_element_type=jnp.float32,
                          precision=prec)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _banded_spmm_fwd(bm: BandedMatrix, x: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """out (num_nodes, F) = A @ x via one streaming pass over the bands."""
    out_dtype = x.dtype
    nb, tb = bm.nb, bm.tb
    n_bands = len(bm.offsets)
    n_pad = nb * tb
    if x.shape[0] != n_pad:
        x = jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))
    # bf16 bands pull the activations down to bf16 too: double MXU rate and
    # half the x-window traffic; accumulation stays f32.
    if bm.bands.dtype != x.dtype:
        x = x.astype(bm.bands.dtype)

    F = x.shape[1]
    tf = F if F <= TF_MAX else 256
    pad_f = (-F) % tf
    if pad_f:
        x = jnp.pad(x, ((0, 0), (0, pad_f)))
    Fp = F + pad_f
    n_ft = Fp // tf

    # Band offsets ride in as a scalar-prefetch operand so the x-window index
    # map can read them (index maps may not capture array constants).
    offs = jnp.asarray(bm.offsets, jnp.int32)

    def x_index(f, i, k, offs_ref):
        # clamped window: out-of-range rows pair with all-zero band blocks
        return (jnp.clip(i + offs_ref[k], 0, nb - 1), f)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ft, nb, n_bands),
        in_specs=[
            pl.BlockSpec((1, 1, tb, tb), lambda f, i, k, o: (k, i, 0, 0)),
            pl.BlockSpec((tb, tf), x_index),
        ],
        out_specs=pl.BlockSpec((tb, tf), lambda f, i, k, o: (i, f)),
    )
    out = pl.pallas_call(
        _banded_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, Fp), jnp.float32),
        interpret=interpret,
    )(offs, bm.bands, x)
    out = out[:, :F] if pad_f else out
    return out[: bm.num_nodes].astype(out_dtype)


def _transpose_banded(bm: BandedMatrix) -> BandedMatrix:
    """A^T of a banded matrix, built with jnp (for the VJP fallback when no
    prebuilt ``banded_rev`` exists): band d of A contributes band -d of A^T
    with block-rows shifted by d and each block transposed."""
    tr = []
    for k, d in enumerate(bm.offsets):
        # A^T block (j, j-d) = A block (j-d, j)^T  ->  band -d, row j holds
        # bands[k, j - (-d) ... ] shifted: rows j of the new band read
        # bands[k, j + (-d)] ... implemented as a roll with zero fill.
        blk = jnp.swapaxes(bm.bands[k], -1, -2)  # (nb, TB, TB)
        if d > 0:
            blk = jnp.concatenate(
                [jnp.zeros((d,) + blk.shape[1:], blk.dtype), blk[:-d]], 0)
        elif d < 0:
            blk = jnp.concatenate(
                [blk[-d:], jnp.zeros((-d,) + blk.shape[1:], blk.dtype)], 0)
        tr.append(blk)
    offsets = tuple(-d for d in bm.offsets)
    order = sorted(range(len(offsets)), key=lambda i: offsets[i])
    bands = jnp.stack([tr[i] for i in order])
    return BandedMatrix(bands=bands,
                        offsets=tuple(offsets[i] for i in order),
                        nb=bm.nb, tb=bm.tb, num_nodes=bm.num_nodes)


@jax.custom_vjp
def banded_spmm_pallas(x: jax.Array, bm: BandedMatrix,
                       bm_rev: Optional[BandedMatrix] = None) -> jax.Array:
    """Differentiable banded SpMM ``A @ x`` on the Pallas streaming kernel.

    ``bm_rev`` (the banded matrix of the reversed edges, i.e. ``A^T``) makes
    the backward pass a second streaming kernel; ``ops.precompute`` builds it
    as ``cache['banded_rev']``.
    """
    return _banded_spmm_fwd(bm, x)


def _fwd(x, bm, bm_rev):
    return _banded_spmm_fwd(bm, x), (bm, bm_rev, x.shape[0])


def _bwd(res, g):
    bm, bm_rev, n_in = res
    bmt = bm_rev if bm_rev is not None else _transpose_banded(bm)
    gx = _banded_spmm_fwd(bmt, g)[:n_in]
    from .segment_kernels import _zeros_like_tree

    return (gx.astype(g.dtype), _zeros_like_tree(bm),
            None if bm_rev is None else _zeros_like_tree(bm_rev))


banded_spmm_pallas.defvjp(_fwd, _bwd)
