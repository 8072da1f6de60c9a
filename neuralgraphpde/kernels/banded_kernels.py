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


# ------------------------------------------- packed (row-list) block bands
# Same kernel bodies, different addressing: block-row ``i`` streams its own
# nonzero blocks (slot-major), and the x-block index comes from the
# prefetched ``cols`` table instead of a static diagonal offset. This is
# the post-RCM unstructured-mesh path: the r5 profile showed the dense
# diagonals of ``BandedMatrix`` were 811× zero-inflated there and the value
# stream dominated 2:1 (ROADMAP r5) — packing at TB=128 cuts it ~2.2×.


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pbanded_spmm_fwd(pb, x: jax.Array, interpret: bool = False) -> jax.Array:
    from ..ops.bsr import PackedBanded  # noqa: F401 (type only)

    out_dtype = x.dtype
    nb, tb, tbr = pb.nb, pb.tb, pb.row_height
    nbc = pb.num_col_blocks
    S = pb.blocks.shape[0]
    n_pad_c = nbc * tb
    if x.shape[0] != n_pad_c:
        x = jnp.pad(x, ((0, n_pad_c - x.shape[0]), (0, 0)))
    if pb.blocks.dtype != x.dtype:
        x = x.astype(pb.blocks.dtype)
    F = x.shape[1]
    tf = F if F <= TF_MAX else 256
    pad_f = (-F) % tf
    if pad_f:
        x = jnp.pad(x, ((0, 0), (0, pad_f)))
    Fp = F + pad_f
    n_ft = Fp // tf

    def x_index(f, i, s, cols_ref):
        return (cols_ref[i, s], f)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ft, nb, S),
        in_specs=[
            pl.BlockSpec((1, 1, tbr, tb), lambda f, i, s, c: (s, i, 0, 0)),
            pl.BlockSpec((tb, tf), x_index),
        ],
        out_specs=pl.BlockSpec((tbr, tf), lambda f, i, s, c: (i, f)),
    )
    out = pl.pallas_call(
        _banded_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * tbr, Fp), jnp.float32),
        interpret=interpret,
    )(pb.cols, pb.blocks, x)
    out = out[:, :F] if pad_f else out
    return out[: pb.num_nodes].astype(out_dtype)


@jax.custom_vjp
def pbanded_spmm_pallas(x: jax.Array, pb, pb_rev=None) -> jax.Array:
    """Differentiable packed-band SpMM ``A @ x``; ``pb_rev`` (= Aᵀ packed,
    ``ops.bsr.transpose_packed_banded``) makes the backward a second
    streaming pass."""
    return _pbanded_spmm_fwd(pb, x)


def _pb_fwd(x, pb, pb_rev):
    return _pbanded_spmm_fwd(pb, x), (pb, pb_rev, x.shape[0])


def _pb_bwd(res, g):
    pb, pb_rev, n_in = res
    from .segment_kernels import _zeros_like_tree

    if pb_rev is None:
        raise NotImplementedError(
            "pbanded backward needs the prebuilt transpose (pb_rev); "
            "ops.precompute stores cache['pbanded_rev']")
    gx = _pbanded_spmm_fwd(pb_rev, g)[:n_in]
    return (gx.astype(g.dtype), _zeros_like_tree(pb),
            _zeros_like_tree(pb_rev))


pbanded_spmm_pallas.defvjp(_pb_fwd, _pb_bwd)


# ----------------------------------------------- fused GCN RHS (epilogue)
# Degree normalization is baked into the band VALUES at precompute time
# (``ops.precompute(gcn_fused=True)`` stores C·Ã·C, C = D^-1/2), and the GCN
# epilogue — weight matmul, bias, activation — runs in the kernel at the last
# band while the accumulator is still VMEM-resident. The full reference RHS
# ``σ(W(D^-1/2 Ã D^-1/2 x) + b)`` (src/layers.jl:224-238) then costs exactly
# one streaming pass: x is read once, y is written once, and the two
# elementwise N×F degree scalings plus the separate matmul read/write that
# the layer-by-layer formulation pays (4 extra N×F HBM round trips) vanish.

_EPILOGUE_ACTS = {
    "identity": lambda x: x,
    "tanh": jnp.tanh,
    "relu": lambda x: jnp.maximum(x, 0.0),
    "sigmoid": jax.nn.sigmoid,
}


def epilogue_supported(act) -> bool:
    """Activations whose derivative is recoverable from the OUTPUT (the VJP
    saves only y): tanh' = 1-y², sigmoid' = y(1-y), relu' = [y>0]."""
    return act is None or (isinstance(act, str) and act in _EPILOGUE_ACTS)


def _act_grad_from_y(act, y):
    if act in (None, "identity"):
        return 1.0
    if act == "tanh":
        return 1.0 - y * y
    if act == "sigmoid":
        return y * (1.0 - y)
    if act == "relu":
        return (y > 0).astype(y.dtype)
    raise ValueError(act)


def _hi_for(arr):
    """HIGHEST for f32 operands (default truncates to bf16 on the MXU) —
    same rule as the kernels; the r5 pbanded on-chip check caught the VJP
    epilogue dots running at default precision."""
    return (jax.lax.Precision.HIGHEST
            if arr.dtype == jnp.float32 else None)


def _make_rhs_kernel(n_bands: int, act, has_w: bool, has_b: bool):
    act_fn = _EPILOGUE_ACTS["identity" if act is None else act]

    def kernel(offs_ref, bands_ref, x_ref, *rest, acc_ref):
        del offs_ref
        i = 0
        w_ref = rest[i] if has_w else None
        i += has_w
        b_ref = rest[i] if has_b else None
        i += has_b
        out_ref = rest[i]

        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        prec = (jax.lax.Precision.HIGHEST
                if bands_ref.dtype == jnp.float32 else None)
        acc_ref[:] += jnp.dot(bands_ref[0, 0], x_ref[:],
                              preferred_element_type=jnp.float32,
                              precision=prec)

        @pl.when(k == n_bands - 1)
        def _():
            h = acc_ref[:]
            if has_w:
                wprec = (jax.lax.Precision.HIGHEST
                         if w_ref.dtype == jnp.float32 else None)
                h = jnp.dot(h.astype(w_ref.dtype), w_ref[:],
                            preferred_element_type=jnp.float32,
                            precision=wprec)
            if has_b:
                h = h + b_ref[:]
            out_ref[:] = act_fn(h)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("act", "interpret"))
def _banded_rhs_fwd(bm: BandedMatrix, x: jax.Array,
                    w: Optional[jax.Array], b: Optional[jax.Array],
                    act=None, interpret: bool = False) -> jax.Array:
    nb, tb = bm.nb, bm.tb
    n_bands = len(bm.offsets)
    n_pad = nb * tb
    if x.shape[0] != n_pad:
        x = jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))
    if bm.bands.dtype != x.dtype:
        x = x.astype(bm.bands.dtype)
    F = x.shape[1]
    if F > TF_MAX:
        raise ValueError(f"fused RHS needs F <= {TF_MAX}, got {F}")
    out_w = w.shape[1] if w is not None else F
    if w is not None and bm.bands.dtype == jnp.bfloat16:
        w = w.astype(jnp.bfloat16)

    offs = jnp.asarray(bm.offsets, jnp.int32)

    def x_index(i, k, offs_ref):
        return (jnp.clip(i + offs_ref[k], 0, nb - 1), 0)

    in_specs = [
        pl.BlockSpec((1, 1, tb, tb), lambda i, k, o: (k, i, 0, 0)),
        pl.BlockSpec((tb, F), x_index),
    ]
    args = [bm.bands, x]
    if w is not None:
        in_specs.append(pl.BlockSpec(w.shape, lambda i, k, o: (0, 0)))
        args.append(w)
    if b is not None:
        in_specs.append(pl.BlockSpec(b.shape, lambda i, k, o: (0, 0)))
        args.append(b)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, n_bands),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, out_w), lambda i, k, o: (i, 0)),
        scratch_shapes=[pltpu.VMEM((tb, F), jnp.float32)],
    )
    kernel = _make_rhs_kernel(n_bands, act, w is not None, b is not None)

    def body(offs_ref, bands_ref, x_ref, *rest):
        kernel(offs_ref, bands_ref, x_ref, *rest[:-1], acc_ref=rest[-1])

    out = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, out_w), jnp.float32),
        interpret=interpret,
    )(offs, *args)
    return out[: bm.num_nodes]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def banded_gcn_rhs(act, x, w, b, bm, bm_rev):
    """Fused ``σ((Ĉ·x)·W + b)`` where Ĉ = C·Ã·C is the degree-normalized
    banded matrix (``cache['banded_norm']``): one streaming kernel for the
    whole GCN ODE RHS. ``w``/``b`` may be None (identity / no bias) — the
    out<in pre-multiply variant passes ``w=None`` with ``x`` already
    projected. Returns f32 ``(num_nodes, out)``."""
    return _banded_rhs_fwd(bm, x, w, b, act=act)


def _rhs_vjp_fwd(act, x, w, b, bm, bm_rev):
    y = _banded_rhs_fwd(bm, x, w, b, act=act)
    return y, (x, w, b, bm, bm_rev, y)


def _rhs_vjp_bwd(act, res, g):
    x, w, b, bm, bm_rev, y = res
    from .segment_kernels import _zeros_like_tree

    dz = g * _act_grad_from_y(act, y)  # (N, out) f32
    db = None if b is None else jnp.sum(dz, axis=0, keepdims=True).astype(
        b.dtype)
    if w is not None:
        # recompute the aggregation for dW (one extra streaming pass)
        agg = _banded_spmm_fwd(bm, x)  # (N, F) f32
        dw = jnp.dot(agg.T, dz, precision=_hi_for(agg),
                     preferred_element_type=jnp.float32).astype(w.dtype)
        gup = jnp.dot(dz, w.T.astype(dz.dtype), precision=_hi_for(dz),
                      preferred_element_type=jnp.float32)
    else:
        dw = None
        gup = dz
    bmt = bm_rev if bm_rev is not None else _transpose_banded(bm)
    dx = _banded_spmm_fwd(bmt, gup)[: x.shape[0]]
    return (dx.astype(x.dtype), dw, db, _zeros_like_tree(bm),
            None if bm_rev is None else _zeros_like_tree(bm_rev))


banded_gcn_rhs.defvjp(_rhs_vjp_fwd, _rhs_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("act", "interpret"))
def _pbanded_rhs_fwd(pb, x: jax.Array, w: Optional[jax.Array],
                     b: Optional[jax.Array], act=None,
                     interpret: bool = False) -> jax.Array:
    """Fused GCN RHS on packed block bands (same epilogue contract as
    ``_banded_rhs_fwd``)."""
    nb, tb, tbr = pb.nb, pb.tb, pb.row_height
    nbc = pb.num_col_blocks
    S = pb.blocks.shape[0]
    n_pad_c = nbc * tb
    if x.shape[0] != n_pad_c:
        x = jnp.pad(x, ((0, n_pad_c - x.shape[0]), (0, 0)))
    if pb.blocks.dtype != x.dtype:
        x = x.astype(pb.blocks.dtype)
    F = x.shape[1]
    if F > TF_MAX:
        raise ValueError(f"fused RHS needs F <= {TF_MAX}, got {F}")
    out_w = w.shape[1] if w is not None else F
    if w is not None and pb.blocks.dtype == jnp.bfloat16:
        w = w.astype(jnp.bfloat16)

    def x_index(i, s, cols_ref):
        return (cols_ref[i, s], 0)

    in_specs = [
        pl.BlockSpec((1, 1, tbr, tb), lambda i, s, c: (s, i, 0, 0)),
        pl.BlockSpec((tb, F), x_index),
    ]
    args = [pb.blocks, x]
    if w is not None:
        in_specs.append(pl.BlockSpec(w.shape, lambda i, s, c: (0, 0)))
        args.append(w)
    if b is not None:
        in_specs.append(pl.BlockSpec(b.shape, lambda i, s, c: (0, 0)))
        args.append(b)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, S),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tbr, out_w), lambda i, s, c: (i, 0)),
        scratch_shapes=[pltpu.VMEM((tbr, F), jnp.float32)],
    )
    kernel = _make_rhs_kernel(S, act, w is not None, b is not None)

    def body(cols_ref, blocks_ref, x_ref, *rest):
        kernel(cols_ref, blocks_ref, x_ref, *rest[:-1], acc_ref=rest[-1])

    out = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * tbr, out_w), jnp.float32),
        interpret=interpret,
    )(pb.cols, *args)
    return out[: pb.num_nodes]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def pbanded_gcn_rhs(act, x, w, b, pb, pb_rev):
    """Fused ``σ((Ĉ·x)·W + b)`` on packed block bands — the post-RCM
    unstructured-mesh analog of ``banded_gcn_rhs`` (same out<in pre-multiply
    convention; ``cache['pbanded_norm']``)."""
    return _pbanded_rhs_fwd(pb, x, w, b, act=act)


def _prhs_vjp_fwd(act, x, w, b, pb, pb_rev):
    y = _pbanded_rhs_fwd(pb, x, w, b, act=act)
    return y, (x, w, b, pb, pb_rev, y)


def _prhs_vjp_bwd(act, res, g):
    x, w, b, pb, pb_rev, y = res
    from .segment_kernels import _zeros_like_tree

    dz = g * _act_grad_from_y(act, y)
    db = None if b is None else jnp.sum(dz, axis=0, keepdims=True).astype(
        b.dtype)
    if w is not None:
        agg = _pbanded_spmm_fwd(pb, x)
        dw = jnp.dot(agg.T, dz, precision=_hi_for(agg),
                     preferred_element_type=jnp.float32).astype(w.dtype)
        gup = jnp.dot(dz, w.T.astype(dz.dtype), precision=_hi_for(dz),
                      preferred_element_type=jnp.float32)
    else:
        dw = None
        gup = dz
    if pb_rev is None:
        raise NotImplementedError(
            "pbanded backward needs the prebuilt transpose (pb_rev)")
    dx = _pbanded_spmm_fwd(pb_rev, gup)[: x.shape[0]]
    return (dx.astype(x.dtype), dw, db, _zeros_like_tree(pb),
            _zeros_like_tree(pb_rev))


pbanded_gcn_rhs.defvjp(_prhs_vjp_fwd, _prhs_vjp_bwd)
