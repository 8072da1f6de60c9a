"""Pallas TPU kernels: sorted segment-sum / SpMM as MXU matmuls.

The reference's aggregation bottoms out in NNlibCUDA scatter kernels (SURVEY
§2.2); XLA:TPU lowers ``segment_sum`` to a scatter-add that serializes
updates. This module replaces the hot path with a TPU-native formulation:

1. Host-side, the receiver-sorted edge list is chopped into fixed-size chunks
   that never straddle an output node-tile boundary (``build_tiled_csr``).
2. XLA performs the sender-feature gather (batched row gather is efficient).
3. A Pallas kernel turns each chunk's segment-sum into a one-hot matrix
   multiply on the MXU: ``out_tile += onehot(recv_local) @ xj_chunk``,
   revisiting the same output block across consecutive chunks of a tile (the
   canonical matmul-K-loop accumulation pattern).

Edge weights fold into the one-hot matrix for free, so ``e_mul_xj`` costs the
same as ``copy_xj``. The transposed product gives the backward pass: a
reverse-orientation tiling is prebuilt and ``custom_vjp`` reuses the same
kernel.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default tile sizes: TN output rows (MXU-aligned), TE edges per chunk.
TN_DEFAULT = 256
TE_DEFAULT = 512
TF_MAX = 512

# Kernel compute dtype for the gathered operand and one-hot factor.
# bfloat16 halves the dominant HBM traffic (gather + chunk streams);
# accumulation stays float32 (MXU preferred_element_type).
_COMPUTE_DTYPE = None  # None -> follow input dtype


def set_kernel_compute_dtype(dtype) -> None:
    """Set to jnp.bfloat16 to halve kernel HBM traffic (f32 accumulate);
    None restores input-dtype compute."""
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True, eq=False)
class TiledCSR:
    """Chunked receiver-sorted edge layout for the Pallas segment kernel."""

    senders: jax.Array  # (C, TE) int32 global sender ids (0 on padding)
    recv_local: jax.Array  # (C, TE) int32 receiver - tile_start
    wmask: jax.Array  # (C, TE) float32 edge weight (0 on padding)
    chunk_tile: jax.Array  # (C,) int32 output node-tile of each chunk
    num_tiles: int
    tn: int
    te: int
    num_nodes: int  # true node count (<= num_tiles * tn)

    def tree_flatten(self):
        return ((self.senders, self.recv_local, self.wmask, self.chunk_tile),
                (self.num_tiles, self.tn, self.te, self.num_nodes))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def build_tiled_csr(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    *,
    edge_weight: Optional[np.ndarray] = None,
    tn: int = TN_DEFAULT,
    te: int = TE_DEFAULT,
) -> TiledCSR:
    """Host-side tiling. ``receivers`` need not be pre-sorted. Uses the
    native C++ builder (csrc/graph_ops.cpp) when available."""
    from .. import native

    num_tiles_out = max(-(-num_nodes // tn), 1)
    if native.available():
        built = native.tiled_csr(
            np.asarray(senders), np.asarray(receivers), num_nodes,
            edge_weight=None if edge_weight is None
            else np.asarray(edge_weight), tn=tn, te=te)
        if built is not None:
            sk, rl, wm, ct = built
            return TiledCSR(
                senders=jnp.asarray(sk), recv_local=jnp.asarray(rl),
                wmask=jnp.asarray(wm), chunk_tile=jnp.asarray(ct),
                num_tiles=num_tiles_out, tn=tn, te=te, num_nodes=num_nodes,
            )

    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    E = senders.shape[0]
    w = (np.ones(E, np.float32) if edge_weight is None
         else np.asarray(edge_weight, np.float32).reshape(-1))

    # Sort by (receiver tile, sender): tile membership is all that
    # correctness needs (the one-hot handles any in-tile order), and
    # sender-sorted chunks make the XLA gather's HBM access near-sequential.
    tile_key = (receivers // tn) * (senders.max() + 2 if E else 1) + senders
    order = np.argsort(tile_key, kind="stable")
    s, r, w = senders[order], receivers[order], w[order]

    num_tiles = max(-(-num_nodes // tn), 1)
    tile_of_edge = r // tn
    counts = np.bincount(tile_of_edge, minlength=num_tiles)

    chunks_per_tile = np.maximum(-(-counts // te), 1)
    C = int(chunks_per_tile.sum())

    sk = np.zeros((C, te), np.int32)
    rl = np.zeros((C, te), np.int32)
    wm = np.zeros((C, te), np.float32)
    ct = np.zeros((C,), np.int32)

    edge_off = np.concatenate([[0], np.cumsum(counts)])
    c = 0
    for t in range(num_tiles):
        lo, hi = int(edge_off[t]), int(edge_off[t + 1])
        pos = lo
        for _ in range(int(chunks_per_tile[t])):
            n = min(te, hi - pos)
            if n > 0:
                sk[c, :n] = s[pos:pos + n]
                rl[c, :n] = r[pos:pos + n] - t * tn
                wm[c, :n] = w[pos:pos + n]
            ct[c] = t
            pos += n
            c += 1

    return TiledCSR(
        senders=jnp.asarray(sk), recv_local=jnp.asarray(rl),
        wmask=jnp.asarray(wm), chunk_tile=jnp.asarray(ct),
        num_tiles=num_tiles, tn=tn, te=te, num_nodes=num_nodes,
    )


def _segment_kernel(chunk_tile_ref, xj_ref, recv_ref, wmask_ref, out_ref):
    """grid = (num_feature_tiles, num_chunks); chunks iterate fastest so the
    output block stays resident across a tile's chunks.

    Layout note: recv/wmask blocks are (1, TE, 1) — TE on the sublane dim
    keeps Mosaic's (8, 128)-divisibility rule satisfied; the one-hot matrix
    is therefore built (TE, TN) and contracted over its sublane dim.
    """
    c = pl.program_id(1)

    prev_tile = chunk_tile_ref[jnp.maximum(c, 1) - 1]
    first = (c == 0) | (chunk_tile_ref[c] != prev_tile)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tn = out_ref.shape[0]
    te = recv_ref.shape[1]
    recv = recv_ref[0]  # (TE, 1)
    w = wmask_ref[0]  # (TE, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (te, tn), 1)
    onehot = jnp.where(cols == recv, w, 0.0)  # (TE, TN) f32
    # A bf16 compute dtype halves the gather's HBM traffic; the MXU input is
    # widened back to f32 in VMEM (cheap) — full-precision accumulation.
    # f32 operands must request HIGHEST precision: the MXU's default f32
    # matmul truncates inputs to bf16 (caught by tests/tpu_compiled_checks.py
    # — interpret mode never sees it); the bf16-gather path keeps the fast
    # default passes.
    prec = (jax.lax.Precision.HIGHEST
            if xj_ref.dtype == jnp.float32 else None)
    xj = xj_ref[0].astype(jnp.float32)
    out_ref[:] += jax.lax.dot_general(
        onehot, xj,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


@functools.partial(jax.jit, static_argnames=("interpret", "compute_dtype"))
def _tiled_segment_spmm_fwd(tcsr: TiledCSR, x: jax.Array,
                            interpret: bool = False,
                            compute_dtype=None) -> jax.Array:
    """out (num_tiles*tn, F) = scatter-sum of weighted x[senders]."""
    out_dtype = x.dtype
    cd = compute_dtype if compute_dtype is not None else _COMPUTE_DTYPE
    if cd is not None:
        x = x.astype(cd)
    C, te = tcsr.senders.shape
    F = x.shape[1]
    tf = F if F <= TF_MAX else 256
    if F % tf != 0:
        # pad features to tile multiple
        pad = tf - F % tf
        x = jnp.pad(x, ((0, 0), (0, pad)))
        Fp = F + pad
    else:
        Fp = F
    n_ft = Fp // tf

    xj = jnp.take(x, tcsr.senders.reshape(-1), axis=0).reshape(C, te, Fp)
    recv3 = tcsr.recv_local.reshape(C, te, 1)
    # wmask stays f32 regardless of compute dtype (narrow bf16 (TE,1) blocks
    # crash the Mosaic compiler); the one-hot is cast after construction.
    wmask3 = tcsr.wmask.reshape(C, te, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ft, C),
        in_specs=[
            pl.BlockSpec((1, te, tf), lambda f, c, ct: (c, 0, f)),
            pl.BlockSpec((1, te, 1), lambda f, c, ct: (c, 0, 0)),
            pl.BlockSpec((1, te, 1), lambda f, c, ct: (c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tcsr.tn, tf), lambda f, c, ct: (ct[c], f)),
    )
    out = pl.pallas_call(
        _segment_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tcsr.num_tiles * tcsr.tn, Fp),
                                       jnp.float32),
        interpret=interpret,
    )(tcsr.chunk_tile, xj, recv3, wmask3)
    out = out[:, :F] if Fp != F else out
    return out.astype(out_dtype)


def _zeros_like_tree(tree):
    # integer leaves take float0 cotangents per JAX convention
    return jax.tree_util.tree_map(
        lambda l: np.zeros(l.shape, jax.dtypes.float0)
        if jnp.issubdtype(l.dtype, jnp.integer) else jnp.zeros_like(l), tree)


@jax.custom_vjp
def tiled_segment_spmm(x: jax.Array, tcsr: TiledCSR,
                       reverse_tcsr: Optional[TiledCSR] = None) -> jax.Array:
    """Differentiable Pallas SpMM: ``out[i] = Σ_{e: recv_e=i} w_e x[send_e]``.

    ``reverse_tcsr`` (transposed orientation, built once per graph) makes the
    backward pass a second Pallas SpMM; without it the backward uses XLA
    scatter."""
    return _tiled_segment_spmm_fwd(tcsr, x)


def _spmm_fwd(x, tcsr, reverse_tcsr):
    return (_tiled_segment_spmm_fwd(tcsr, x),
            (tcsr, reverse_tcsr, x.shape[0]))


def _spmm_bwd(res, g):
    tcsr, reverse_tcsr, n_in = res
    if reverse_tcsr is not None:
        gx = _tiled_segment_spmm_fwd(reverse_tcsr, g)[:n_in]
    else:
        # XLA fallback: grad_x[j] = sum_{e: sender j} w_e * g[recv_e]
        recv_global = (tcsr.chunk_tile[:, None] * tcsr.tn + tcsr.recv_local)
        gj = jnp.take(g, recv_global.reshape(-1), axis=0)
        gj = gj * tcsr.wmask.reshape(-1, 1)
        gx = jax.ops.segment_sum(gj, tcsr.senders.reshape(-1),
                                 num_segments=n_in)
    tcsr_bar = _zeros_like_tree(tcsr)
    rev_bar = None if reverse_tcsr is None else _zeros_like_tree(reverse_tcsr)
    return (gx.astype(g.dtype), tcsr_bar, rev_bar)


tiled_segment_spmm.defvjp(_spmm_fwd, _spmm_bwd)


# ------------------------------------------------- grouped (slab) execution
def split_tiled_csr(tcsr: TiledCSR, max_edges_per_group: int):
    """Split a tiling into contiguous, TILE-ALIGNED chunk ranges of roughly
    ``max_edges_per_group`` edges each.

    Very large graphs (BASELINE config 5, ~124M edges) cannot afford the
    gathered edge tensor ``E×F`` in HBM; executing the SpMM per group bounds
    the peak gather slab to ``max_edges_per_group × F`` while each output
    tile is still written exactly once (groups never split a tile)."""
    ct = np.asarray(tcsr.chunk_tile)
    C = ct.shape[0]
    per = max(1, max_edges_per_group // tcsr.te)
    groups = []
    start = 0
    while start < C:
        end = min(start + per, C)
        while end < C and ct[end] == ct[end - 1]:
            end += 1
        tile0, tile1 = int(ct[start]), int(ct[end - 1]) + 1
        groups.append(TiledCSR(
            senders=tcsr.senders[start:end],
            recv_local=tcsr.recv_local[start:end],
            wmask=tcsr.wmask[start:end],
            chunk_tile=jnp.asarray(ct[start:end] - tile0),
            num_tiles=tile1 - tile0, tn=tcsr.tn, te=tcsr.te,
            num_nodes=min(tcsr.num_nodes - tile0 * tcsr.tn,
                          (tile1 - tile0) * tcsr.tn),
        ))
        start = end
    return tuple(groups)


def _grouped_fwd(groups, x):
    return jnp.concatenate(
        [_tiled_segment_spmm_fwd(g, x) for g in groups], axis=0)


@jax.custom_vjp
def tiled_segment_spmm_grouped(x: jax.Array, groups, groups_rev):
    """Differentiable grouped Pallas SpMM (see ``split_tiled_csr``): one
    kernel launch per tile-aligned group keeps the gathered slab bounded.
    Returns ``(Σ_g num_tiles_g · tn, F)`` rows — slice to num_nodes."""
    return _grouped_fwd(groups, x)


def _grouped_vjp_fwd(x, groups, groups_rev):
    return _grouped_fwd(groups, x), (groups, groups_rev, x.shape[0])


def _grouped_vjp_bwd(res, g):
    groups, groups_rev, n_in = res
    gx = _grouped_fwd(groups_rev, g)[:n_in]
    return (gx.astype(g.dtype), _zeros_like_tree(groups),
            _zeros_like_tree(groups_rev))


tiled_segment_spmm_grouped.defvjp(_grouped_vjp_fwd, _grouped_vjp_bwd)


# ------------------------------------------------------------ max / min
_NEG = float(np.finfo(np.float32).min)


def _shift_down(x, s, fill):
    """Shift rows down by ``s`` along the sublane dim, filling the top."""
    pad = jnp.full((s,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[:-s]], axis=0)


def _segment_max_kernel(chunk_tile_ref, msg_ref, recv_ref, wmask_ref,
                        out_ref):
    """Segment-max over receiver-sorted chunks.

    The in-chunk receiver ids are non-decreasing (the edge-index tiling of a
    receiver-sorted graph preserves edge order), so each receiver's edges
    form one contiguous run per chunk: a segmented inclusive max-scan (log2
    TE shifted-max passes on the VPU) leaves the full run maximum at each
    run's last slot, and a one-hot matmul places exactly that one value per
    receiver row. Cross-chunk combination is an elementwise max on the
    VMEM-resident output tile.
    """
    c = pl.program_id(1)
    prev_tile = chunk_tile_ref[jnp.maximum(c, 1) - 1]
    first = (c == 0) | (chunk_tile_ref[c] != prev_tile)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.full_like(out_ref, _NEG)

    tn = out_ref.shape[0]
    te = recv_ref.shape[1]
    recv = recv_ref[0]  # (TE, 1) int32
    valid = wmask_ref[0] > 0  # (TE, 1)
    # masked slots go to a trailing pseudo-segment (id TN) so they never
    # merge with real runs nor hit the one-hot
    recv_eff = jnp.where(valid, recv, tn)
    val = jnp.where(valid, msg_ref[0].astype(jnp.float32), _NEG)  # (TE, F)

    s = 1
    while s < te:
        pv = _shift_down(val, s, _NEG)
        pr = _shift_down(recv_eff, s, -1)
        val = jnp.maximum(val, jnp.where(pr == recv_eff, pv, _NEG))
        s *= 2

    # run-end slots: the next slot starts a different segment
    nxt = jnp.concatenate(
        [recv_eff[1:], jnp.full((1, 1), tn + 1, recv_eff.dtype)], axis=0)
    is_end = (nxt != recv_eff) & valid  # (TE, 1)

    cols = jax.lax.broadcasted_iota(jnp.int32, (te, tn), 1)
    onehot = jnp.where((cols == recv_eff) & is_end, 1.0, 0.0)  # (TE, TN)
    endval = jnp.where(is_end, val, 0.0)
    contrib = jax.lax.dot_general(
        onehot, endval, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # (TN, F)
    present = jnp.sum(onehot, axis=0)[:, None] > 0  # (TN, 1)
    out_ref[:] = jnp.where(present, jnp.maximum(out_ref[:], contrib),
                           out_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tiled_segment_max_fwd(tcsr: TiledCSR, messages: jax.Array,
                           interpret: bool = False) -> jax.Array:
    """Receiver segment-max of per-edge messages through the edge-index
    tiling (``tcsr`` must be the ``tcsr_edges`` layout of a receiver-sorted
    graph). Empty receivers get ``-inf`` (jax.ops.segment_max convention)."""
    out_dtype = messages.dtype
    C, te = tcsr.senders.shape
    F = messages.shape[1]
    tf = F if F <= TF_MAX else 256
    pad = (-F) % tf
    if pad:
        messages = jnp.pad(messages, ((0, 0), (0, pad)))
    Fp = F + pad
    n_ft = Fp // tf

    msg = jnp.take(messages, tcsr.senders.reshape(-1), axis=0)
    msg = msg.reshape(C, te, Fp)
    recv3 = tcsr.recv_local.reshape(C, te, 1)
    wmask3 = tcsr.wmask.reshape(C, te, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ft, C),
        in_specs=[
            pl.BlockSpec((1, te, tf), lambda f, c, ct: (c, 0, f)),
            pl.BlockSpec((1, te, 1), lambda f, c, ct: (c, 0, 0)),
            pl.BlockSpec((1, te, 1), lambda f, c, ct: (c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tcsr.tn, tf), lambda f, c, ct: (ct[c], f)),
    )
    out = pl.pallas_call(
        _segment_max_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tcsr.num_tiles * tcsr.tn, Fp),
                                       jnp.float32),
        interpret=interpret,
    )(tcsr.chunk_tile, msg, recv3, wmask3)
    out = out[:, :F] if pad else out
    out = jnp.where(out == _NEG, -jnp.inf, out)
    return out.astype(out_dtype)


@jax.custom_vjp
def tiled_segment_max(messages: jax.Array, tcsr: TiledCSR,
                      receivers: jax.Array) -> jax.Array:
    """Differentiable Pallas segment-max: ``out[i] = max_{e: recv_e=i} m_e``.

    ``receivers`` is the graph's (E,) receiver array (used by the VJP to
    route cotangents to the arg-max edges; ties all receive the gradient).
    """
    return _tiled_segment_max_fwd(tcsr, messages)


def _smax_fwd(messages, tcsr, receivers):
    out = _tiled_segment_max_fwd(tcsr, messages)
    return out, (messages, out, receivers, tcsr)


def _smax_bwd(res, g):
    messages, out, receivers, tcsr = res
    # cotangent routes to the arg-max edges (all ties receive it)
    winners = messages == jnp.take(out, receivers, axis=0)
    gm = jnp.where(winners, jnp.take(g, receivers, axis=0), 0.0)
    return (gm.astype(messages.dtype), _zeros_like_tree(tcsr),
            np.zeros(receivers.shape, jax.dtypes.float0))


tiled_segment_max.defvjp(_smax_fwd, _smax_bwd)
