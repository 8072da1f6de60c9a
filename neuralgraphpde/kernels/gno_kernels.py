"""Fused GNO kernel-network matvec (Pallas TPU).

GNOConv's message is ``m_e = reshape(ϕ(edge_feats), in×out) · h_send``
(reference src/layers.jl:516-531). Done naively, the per-edge kernel matrix
``W`` costs ``E·in·out`` floats of HBM traffic twice (write by the ϕ matmul,
read by the matvec) — by far the layer's dominant traffic (e.g. 16 KB/edge at
64×64).

This kernel fuses ϕ's LAST linear layer with the matvec and the receiver
segment-sum: per edge chunk it computes, for each input channel ``i``,
``W_i = ph @ Wl[i] + b[i]`` (an MXU matmul over the chunk) and accumulates
``m += W_i * h[:, i]``, then scatters ``m`` onto the output node tile with
the one-hot MXU trick. ``W`` lives only in VMEM.

Layouts (host-prepared, see ``ops.precompute`` / ``build_tiled_csr``):
- ``ph``      (C, TE, K)  — ϕ's last *hidden* activations, chunk-padded
- ``h``       (C, TE, IN) — gathered sender embeddings, chunk-padded
- ``wl``      (IN, K, OUT) — last-layer weight, reshaped so channel ``i``
  slices on the leading dim (lane-aligned dynamic indexing)
- ``bl``      (IN, 1, OUT) — last-layer bias (zeros when absent)

Backward is fused too (r3): a second Pallas kernel recomputes each chunk's
per-channel kernel slices ``W_i`` in VMEM and contracts them against the
chunk's output-gradient rows channel by channel — the ``E·in·out`` tensor
(and its gradient) never exists in HBM in either direction. Weight/bias
gradients accumulate across the sequential TPU grid into revisited output
blocks. (The pre-r3 XLA einsum backward, which materialized ``dW_s`` =
(S, IN, OUT), is kept as ``_fused_bwd_xla`` for A/B.)
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .segment_kernels import TiledCSR


def _gno_kernel(chunk_tile_ref, ph_ref, h_ref, recv_ref, wmask_ref,
                wl_ref, bl_ref, out_ref):
    c = pl.program_id(0)
    prev_tile = chunk_tile_ref[jnp.maximum(c, 1) - 1]
    first = (c == 0) | (chunk_tile_ref[c] != prev_tile)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ph = ph_ref[0]  # (TE, K)
    h = h_ref[0]  # (TE, IN)
    te = ph.shape[0]
    in_chs = h.shape[1]
    out_chs = wl_ref.shape[2]

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, in_chs), 1)

    # f32 MXU ops request HIGHEST precision (default truncates to bf16;
    # see tests/tpu_compiled_checks.py)
    prec = (jax.lax.Precision.HIGHEST
            if ph_ref.dtype == jnp.float32 else None)

    def body(i, m):
        wi = jnp.dot(ph, wl_ref[i], preferred_element_type=jnp.float32,
                     precision=prec)
        wi = wi + bl_ref[i]
        # channel-i column of h via masked reduce (layout-friendly — no
        # dynamic lane slicing)
        h_i = jnp.sum(jnp.where(col_ids == i, h, 0.0), axis=1, keepdims=True)
        return m + wi * h_i

    m = jax.lax.fori_loop(
        0, in_chs, body, jnp.zeros((te, out_chs), jnp.float32))

    tn = out_ref.shape[0]
    recv = recv_ref[0]  # (TE, 1)
    w = wmask_ref[0]  # (TE, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (te, tn), 1)
    onehot = jnp.where(cols == recv, w, 0.0)
    out_ref[:] += jax.lax.dot_general(
        onehot, m, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_gno_fwd(edge_tiling: TiledCSR, senders: jax.Array,
                   ph: jax.Array, h: jax.Array, wl: jax.Array,
                   bl: Optional[jax.Array], interpret: bool = False):
    """edge_tiling: 'senders' are EDGE indices (pads -> 0, masked);
    ``senders`` is the graph's (E,) sender-node array, resolved through the
    edge tiling so ph and h slots stay aligned."""
    C, te = edge_tiling.senders.shape
    K = ph.shape[1]
    in_chs, _, out_chs = wl.shape

    eidx = edge_tiling.senders.reshape(-1)
    ph_c = jnp.take(ph, eidx, axis=0).reshape(C, te, K)
    nidx = jnp.take(senders, eidx)
    h_c = jnp.take(h, nidx, axis=0).reshape(C, te, in_chs)
    recv3 = edge_tiling.recv_local.reshape(C, te, 1)
    wmask3 = edge_tiling.wmask.reshape(C, te, 1)
    if bl is None:
        bl = jnp.zeros((in_chs, 1, out_chs), ph.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, te, K), lambda c, ct: (c, 0, 0)),
            pl.BlockSpec((1, te, in_chs), lambda c, ct: (c, 0, 0)),
            pl.BlockSpec((1, te, 1), lambda c, ct: (c, 0, 0)),
            pl.BlockSpec((1, te, 1), lambda c, ct: (c, 0, 0)),
            pl.BlockSpec((in_chs, K, out_chs), lambda c, ct: (0, 0, 0)),
            pl.BlockSpec((in_chs, 1, out_chs), lambda c, ct: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((edge_tiling.tn, out_chs),
                               lambda c, ct: (ct[c], 0)),
    )
    out = pl.pallas_call(
        _gno_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (edge_tiling.num_tiles * edge_tiling.tn, out_chs), jnp.float32),
        interpret=interpret,
    )(edge_tiling.chunk_tile, ph_c, h_c, recv3, wmask3, wl, bl)
    return out.astype(ph.dtype)


def _gno_bwd_kernel(chunk_tile_ref, ph_ref, h_ref, recv_ref, wmask_ref,
                    wl_ref, bl_ref, g_ref, dph_ref, dh_ref, dwl_ref,
                    dbl_ref):
    """Backward program for one edge chunk. Recompute ``W_i`` per input
    channel in VMEM; contract with the chunk's pulled output-gradient rows:

        gm_e   = w_e · g_out[recv_e]                   (one-hot MXU pull)
        dh[:,i]  = Σ_o W_i ⊙ gm                        (matvec transpose)
        dW_i     = h[:, i] ⊙ gm        (never materialized beyond (TE,OUT))
        dph     += dW_i @ Wl[i]ᵀ
        dwl[i]  += phᵀ @ dW_i          (accumulated across the grid)
        dbl[i]  += Σ_e dW_i
    """
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        dwl_ref[...] = jnp.zeros_like(dwl_ref)
        dbl_ref[...] = jnp.zeros_like(dbl_ref)

    ph = ph_ref[0].astype(jnp.float32)  # (TE, K)
    h = h_ref[0].astype(jnp.float32)  # (TE, IN)
    te, in_chs = h.shape
    tn = g_ref.shape[0]
    # HIGHEST only for true-f32 inputs (r2 truncation lesson); bf16-policy
    # inputs take the 1-pass MXU rate — same conditioning as the forward
    prec = (jax.lax.Precision.HIGHEST
            if ph_ref.dtype == jnp.float32 else None)

    cols = jax.lax.broadcasted_iota(jnp.int32, (te, tn), 1)
    onehot = jnp.where(cols == recv_ref[0], wmask_ref[0], 0.0)
    gm = jnp.dot(onehot, g_ref[...].astype(jnp.float32),
                 preferred_element_type=jnp.float32, precision=prec)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, in_chs), 1)

    def body(i, carry):
        dph, dh = carry
        wl_i = wl_ref[i].astype(jnp.float32)  # (K, OUT)
        wi = jnp.dot(ph, wl_i, preferred_element_type=jnp.float32,
                     precision=prec) + bl_ref[i]
        dh_i = jnp.sum(wi * gm, axis=1, keepdims=True)  # (TE, 1)
        dh = dh + jnp.where(col_ids == i, dh_i, 0.0)
        h_i = jnp.sum(jnp.where(col_ids == i, h, 0.0), axis=1,
                      keepdims=True)
        dw_i = h_i * gm  # (TE, OUT) — the only W-sized live tensor
        dph = dph + jax.lax.dot_general(
            dw_i, wl_i, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        dwl_ref[i] += jax.lax.dot_general(
            ph, dw_i, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        dbl_ref[i] += jnp.sum(dw_i, axis=0, keepdims=True)
        return dph, dh

    K = ph.shape[1]
    dph, dh = jax.lax.fori_loop(
        0, in_chs, body,
        (jnp.zeros((te, K), jnp.float32), jnp.zeros((te, in_chs),
                                                    jnp.float32)))
    dph_ref[0] = dph
    dh_ref[0] = dh


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_gno_bwd_pallas(edge_tiling: TiledCSR, senders: jax.Array,
                          ph: jax.Array, h: jax.Array, wl: jax.Array,
                          bl: Optional[jax.Array], g_out: jax.Array,
                          interpret: bool = False):
    C, te = edge_tiling.senders.shape
    K = ph.shape[1]
    in_chs, _, out_chs = wl.shape

    eidx = edge_tiling.senders.reshape(-1)
    ph_c = jnp.take(ph, eidx, axis=0).reshape(C, te, K)
    nidx = jnp.take(senders, eidx)
    h_c = jnp.take(h, nidx, axis=0).reshape(C, te, in_chs)
    recv3 = edge_tiling.recv_local.reshape(C, te, 1)
    wmask3 = edge_tiling.wmask.reshape(C, te, 1)
    bl_k = (jnp.zeros((in_chs, 1, out_chs), ph.dtype) if bl is None else bl)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, te, K), lambda c, ct: (c, 0, 0)),
            pl.BlockSpec((1, te, in_chs), lambda c, ct: (c, 0, 0)),
            pl.BlockSpec((1, te, 1), lambda c, ct: (c, 0, 0)),
            pl.BlockSpec((1, te, 1), lambda c, ct: (c, 0, 0)),
            pl.BlockSpec((in_chs, K, out_chs), lambda c, ct: (0, 0, 0)),
            pl.BlockSpec((in_chs, 1, out_chs), lambda c, ct: (0, 0, 0)),
            pl.BlockSpec((edge_tiling.tn, out_chs),
                         lambda c, ct: (ct[c], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, te, K), lambda c, ct: (c, 0, 0)),
            pl.BlockSpec((1, te, in_chs), lambda c, ct: (c, 0, 0)),
            pl.BlockSpec((in_chs, K, out_chs), lambda c, ct: (0, 0, 0)),
            pl.BlockSpec((in_chs, 1, out_chs), lambda c, ct: (0, 0, 0)),
        ],
    )
    dph_c, dh_c, dwl, dbl = pl.pallas_call(
        _gno_bwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((C, te, K), jnp.float32),
            jax.ShapeDtypeStruct((C, te, in_chs), jnp.float32),
            jax.ShapeDtypeStruct((in_chs, K, out_chs), jnp.float32),
            jax.ShapeDtypeStruct((in_chs, 1, out_chs), jnp.float32),
        ],
        interpret=interpret,
    )(edge_tiling.chunk_tile, ph_c, h_c, recv3, wmask3, wl, bl_k,
      g_out.astype(jnp.float32))

    dph = jax.ops.segment_sum(dph_c.reshape(-1, K), eidx,
                              num_segments=ph.shape[0])
    dh = jax.ops.segment_sum(dh_c.reshape(-1, in_chs), nidx,
                             num_segments=h.shape[0])
    return dph, dh, dwl, (None if bl is None else dbl)


@jax.custom_vjp
def fused_gno_aggregate(ph, h, wl, bl, edge_tiling, senders):
    """``out[n] = Σ_{e→n} w_e · (reshape(ph_e @ Wl + b, in×out)ᵀ h_send(e))``
    — ϕ-last-layer + per-edge matvec + receiver segment-sum, fused.

    ``wl``: (IN, K, OUT); ``bl``: (IN, 1, OUT) or None. Returns
    ``(num_tiles·tn, OUT)`` (slice to num_nodes).
    """
    return _fused_gno_fwd(edge_tiling, senders, ph, h, wl, bl)


def _fused_fwd(ph, h, wl, bl, edge_tiling, senders):
    out = _fused_gno_fwd(edge_tiling, senders, ph, h, wl, bl)
    return out, (ph, h, wl, bl, edge_tiling, senders)


def _zeros_tiling(t):
    return jax.tree_util.tree_map(
        lambda l: np.zeros(l.shape, jax.dtypes.float0)
        if jnp.issubdtype(l.dtype, jnp.integer) else jnp.zeros_like(l), t)


def _fused_bwd(res, g_out):
    ph, h, wl, bl, edge_tiling, senders = res
    dph, dh, dwl, dbl = _fused_gno_bwd_pallas(edge_tiling, senders, ph, h,
                                              wl, bl, g_out)
    return (dph.astype(ph.dtype), dh.astype(h.dtype), dwl.astype(wl.dtype),
            None if dbl is None else dbl.astype(bl.dtype),
            _zeros_tiling(edge_tiling),
            np.zeros(senders.shape, jax.dtypes.float0))


def _fused_bwd_xla(res, g_out):
    """Pre-r3 backward: XLA einsums on the residuals — materializes the
    (S, IN, OUT) per-edge kernel gradient in HBM. Kept for A/B."""
    ph, h, wl, bl, edge_tiling, senders = res
    C, te = edge_tiling.senders.shape
    in_chs, K, out_chs = wl.shape

    eidx = edge_tiling.senders.reshape(-1)  # edge ids per chunk slot
    nidx = jnp.take(senders, eidx)  # sender node ids per slot
    recv_glob = (edge_tiling.chunk_tile[:, None] * edge_tiling.tn
                 + edge_tiling.recv_local).reshape(-1)
    wm = edge_tiling.wmask.reshape(-1, 1)

    ph_s = jnp.take(ph, eidx, axis=0)  # (S, K)  S = C*te
    h_s = jnp.take(h, nidx, axis=0)  # (S, IN)
    gm = jnp.take(g_out, recv_glob, axis=0) * wm  # (S, OUT)

    # W_s[i, o] = ph_s @ wl[i] + bl[i]
    w_s = jnp.einsum("sk,iko->sio", ph_s, wl) + (
        0.0 if bl is None else bl[None, :, 0, :])
    dh_s = jnp.einsum("sio,so->si", w_s, gm)
    dW_s = h_s[:, :, None] * gm[:, None, :]  # (S, IN, OUT)
    dph_s = jnp.einsum("sio,iko->sk", dW_s, wl)
    dwl = jnp.einsum("sk,sio->iko", ph_s, dW_s)
    dbl = None if bl is None else jnp.sum(dW_s, axis=0)[:, None, :]

    dph = jax.ops.segment_sum(dph_s, eidx, num_segments=ph.shape[0])
    dh = jax.ops.segment_sum(dh_s, nidx, num_segments=h.shape[0])

    def zeros_tiling(t):
        return jax.tree_util.tree_map(
            lambda l: np.zeros(l.shape, jax.dtypes.float0)
            if jnp.issubdtype(l.dtype, jnp.integer) else jnp.zeros_like(l), t)

    return (dph.astype(ph.dtype), dh.astype(h.dtype), dwl.astype(wl.dtype),
            dbl, zeros_tiling(edge_tiling),
            np.zeros(senders.shape, jax.dtypes.float0))


fused_gno_aggregate.defvjp(_fused_fwd, _fused_bwd)


def pack_last_layer(weight: jax.Array, bias: Optional[jax.Array],
                    in_chs: int, out_chs: int):
    """Convert a Dense last layer ``(K, in*out)`` (+ bias ``(1, in*out)``)
    into the kernel's ``(IN, K, OUT)`` / ``(IN, 1, OUT)`` layout, matching
    GNOConv's row-major reshape semantics (w[:, i*out + o] ≡ W[i, o])."""
    K = weight.shape[0]
    wl = weight.reshape(K, in_chs, out_chs).transpose(1, 0, 2)
    bl = None
    if bias is not None:
        bl = bias.reshape(in_chs, out_chs)[:, None, :]
    return wl, bl
