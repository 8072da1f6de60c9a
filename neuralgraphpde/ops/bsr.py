"""Block-sparse (BSR) SpMM — the dense-hardware path for mesh graphs.

Spatially ordered PDE meshes (grids, Delaunay/radius graphs after spatial
sort, RCM-ordered matrices) have block-banded adjacency: nonzero entries
cluster into a small set of ``TB×TB`` blocks near the diagonal. Packing those
blocks densely turns the aggregation into a batched MXU matmul with NO
per-edge gather at all (cf. PAPERS.md, "Fast Training of Sparse GNNs on
Dense Hardware"):

    out[row_block i] = Σ_k A_pack[k] @ x[col_block(k)]        (k: blocks of i)

Traffic per edge ≈ ``TB·TB·bytes / edges_per_block`` — for meshes with a few
hundred edges per nonzero block this beats the gather path several-fold; for
random graphs (no block structure) it degrades to dense and should not be
used (``precompute_bsr`` reports the density so callers can decide).

Pure XLA: block gather (contiguous reads), ``einsum('bij,bjf->bif')`` on the
MXU, short segment-sum over block rows.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.gnngraph import GnnGraph


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True, eq=False)
class BsrMatrix:
    """Packed nonzero blocks of the (receiver, sender) adjacency."""

    blocks: jax.Array  # (nnzb, TB, TB) — A[rb*TB:, cb*TB:] dense content
    col_blocks: jax.Array  # (nnzb,) int32 — sender block index of each block
    row_blocks: jax.Array  # (nnzb,) int32 — receiver block index (sorted)
    num_row_blocks: int
    num_col_blocks: int
    tb: int
    num_nodes: int
    density: float  # nnz blocks / (row_blocks * col_blocks)

    def tree_flatten(self):
        return ((self.blocks, self.col_blocks, self.row_blocks),
                (self.num_row_blocks, self.num_col_blocks, self.tb,
                 self.num_nodes, self.density))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def build_bsr(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    *,
    tb: int = 256,
    edge_weight: Optional[np.ndarray] = None,
    dtype=np.float32,
) -> BsrMatrix:
    """Host-side block packing. ``A[r, s] += w`` per edge ``s -> r``."""
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    E = senders.shape[0]
    w = (np.ones(E, np.float32) if edge_weight is None
         else np.asarray(edge_weight, np.float32).reshape(-1))

    nb = -(-num_nodes // tb)
    rb = receivers // tb
    cb = senders // tb
    key = rb * nb + cb
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    uniq, starts = np.unique(key_s, return_index=True)
    nnzb = len(uniq)

    # accumulate in f32 (np.add.at needs a native dtype), cast at the end
    blocks = np.zeros((nnzb, tb, tb), np.float32)
    row_blocks = (uniq // nb).astype(np.int32)
    col_blocks = (uniq % nb).astype(np.int32)
    bounds = np.concatenate([starts, [E]])
    for k in range(nnzb):
        idx = order[bounds[k]:bounds[k + 1]]
        rr = receivers[idx] - row_blocks[k] * tb
        cc = senders[idx] - col_blocks[k] * tb
        np.add.at(blocks[k], (rr, cc), w[idx])
    if dtype != np.float32:
        import ml_dtypes  # numpy bfloat16 support

        blocks = blocks.astype(
            ml_dtypes.bfloat16 if dtype in ("bfloat16", jnp.bfloat16)
            else dtype)

    return BsrMatrix(
        blocks=jnp.asarray(blocks),
        col_blocks=jnp.asarray(col_blocks),
        row_blocks=jnp.asarray(row_blocks),
        num_row_blocks=nb, num_col_blocks=nb, tb=tb, num_nodes=num_nodes,
        density=nnzb / float(nb * nb),
    )


def bsr_spmm(bsr: BsrMatrix, x: jax.Array) -> jax.Array:
    """``out = A @ x`` over packed blocks. ``x``: (num_nodes, F) (padded
    internally to block multiple); returns (num_nodes, F)."""
    tb = bsr.tb
    n_pad = bsr.num_col_blocks * tb
    if x.shape[0] != n_pad:
        x = jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))
    xb = x.reshape(bsr.num_col_blocks, tb, x.shape[1])
    gathered = jnp.take(xb, bsr.col_blocks, axis=0)  # (nnzb, TB, F)
    # blocks stored bf16 (precompute opt-in) pull the activations down to
    # bf16 too — double MXU rate, f32 accumulation via preferred_element_type
    cdt = (jnp.bfloat16 if bsr.blocks.dtype == jnp.bfloat16 else x.dtype)
    prods = jnp.einsum("bij,bjf->bif", bsr.blocks.astype(cdt),
                       gathered.astype(cdt),
                       preferred_element_type=jnp.float32)
    out_b = jax.ops.segment_sum(
        prods, bsr.row_blocks, num_segments=bsr.num_row_blocks,
        indices_are_sorted=True)
    out = out_b.astype(x.dtype).reshape(bsr.num_row_blocks * tb, -1)
    return out[: bsr.num_nodes]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True, eq=False)
class BandedMatrix:
    """Diagonal-band block storage: band ``d`` holds block ``(i, i+d)`` for
    every block-row ``i`` (zero where absent). One batched matmul per band,
    accumulated directly — no per-block product materialization (the BSR
    formulation's bottleneck)."""

    bands: jax.Array  # (n_bands, nb, TB, TB)
    offsets: tuple  # static band offsets d (col_block - row_block)
    nb: int
    tb: int
    num_nodes: int

    def tree_flatten(self):
        return ((self.bands,), (self.offsets, self.nb, self.tb,
                                self.num_nodes))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


def build_banded(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    *,
    tb: int = 256,
    edge_weight: Optional[np.ndarray] = None,
    max_bands: int = 16,
    dtype=np.float32,
) -> Optional[BandedMatrix]:
    """Build diagonal-band storage; None if the graph needs more than
    ``max_bands`` distinct block-diagonals (not band-structured)."""
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    E = senders.shape[0]
    w = (np.ones(E, np.float32) if edge_weight is None
         else np.asarray(edge_weight, np.float32).reshape(-1))
    nb = -(-num_nodes // tb)
    rb = receivers // tb
    cb = senders // tb
    offsets = np.unique(cb - rb)
    # refuse unstructured graphs: bands must be few AND a small fraction of
    # all possible diagonals (otherwise this is just a dense matrix)
    if len(offsets) > max_bands or len(offsets) >= max((2 * nb - 1) // 2, 2):
        return None
    k_of_edge = np.searchsorted(offsets, cb - rb)
    rloc = receivers - rb * tb
    cloc = senders - cb * tb
    flat = ((k_of_edge * nb + rb) * tb + rloc) * tb + cloc
    shape = (len(offsets), nb, tb, tb)
    jdtype = (jnp.bfloat16 if dtype in ("bfloat16", jnp.bfloat16)
              else jnp.dtype(dtype))
    total = int(np.prod(shape))
    if jax.default_backend() == "cpu":
        # Host build: device transfer is free on CPU, and an EAGER device
        # scatter-add here can deadlock a small host while a stale Pallas
        # interpret-mode io_callback thread is alive (r3 judge repro on a
        # 2-core box) — numpy sidesteps the dispatch machinery entirely.
        host = np.zeros((total,), np.float32)
        np.add.at(host, flat, w)
        bands = jnp.asarray(host.reshape(shape)).astype(jdtype)
    else:
        # Build ON DEVICE by scatter-add from the edge list: host->device
        # transfer is O(E) instead of O(bands) — matters through slow links
        # (the axon tunnel moves ~GB band tensors in minutes, the 12B/edge
        # index+weight stream in under a second).
        bands = jnp.zeros((total,), jnp.float32).at[
            jnp.asarray(flat, jnp.int32 if total < 2**31 else jnp.int64)
        ].add(jnp.asarray(w)).reshape(shape).astype(jdtype)
    return BandedMatrix(bands=bands,
                        offsets=tuple(int(d) for d in offsets),
                        nb=nb, tb=tb, num_nodes=num_nodes)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True, eq=False)
class PackedBanded:
    """Row-packed block-band storage: block-row ``i`` holds its NONZERO
    blocks only, in slots ``s`` with absolute block-column ``cols[i, s]``
    (self-column padding on unused slots — the padded block is zero).

    Motivation (r5 reord profile): after RCM, an unstructured Delaunay mesh
    needs ~19 dense block-diagonals at TB=256 of which each block-row
    populates ~9 — the dense-diagonal ``BandedMatrix`` streams 811× zeros
    for it (bands are the DOMINANT traffic of the banded kernel, 2:1 over
    x). Packing by row at TB=128 cuts the value stream ~2.2× on the bench
    graph; the kernel is unchanged except that the x-block index comes from
    the prefetched ``cols`` instead of a static diagonal offset. Grid
    meshes populate every diagonal, so DIA/banded stay preferred there."""

    blocks: jax.Array  # (S, nb_r, TB_R, TB_C) — slot-major, like bands
    cols: jax.Array  # (nb_r, S) int32 absolute block-COLUMN (pad: self)
    nb: int  # row-block count (ceil(n / tb_rows))
    tb: int  # block COLUMN width (x-fetch granularity)
    num_nodes: int
    # block ROW height; tall blocks (e.g. 512x128) keep the narrow column
    # granularity that makes packing sparse while cutting grid steps below
    # even the dense-diagonal kernel's (r5 sweep: 512x128 on the 131k
    # reord graph = 6912 steps / 1132 MB vs dense 9728 / 1913 MB)
    tb_rows: int = 0  # 0 = square (tb)

    @property
    def row_height(self) -> int:
        return self.tb_rows or self.tb

    @property
    def num_col_blocks(self) -> int:
        return -(-self.num_nodes // self.tb)

    def tree_flatten(self):
        return ((self.blocks, self.cols), (self.nb, self.tb,
                                           self.num_nodes, self.tb_rows))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)


def build_packed_banded(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    *,
    tb: int = 128,
    tb_rows: Optional[int] = None,
    edge_weight: Optional[np.ndarray] = None,
    max_slots: int = 32,
    dtype=np.float32,
) -> Optional[PackedBanded]:
    """Row-packed block storage (``tb_rows`` x ``tb`` blocks; default
    square); None when some block-row needs more than ``max_slots`` nonzero
    blocks (not bandwidth-limited under this tb)."""
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    tbr = tb_rows or tb
    E = senders.shape[0]
    w = (np.ones(E, np.float32) if edge_weight is None
         else np.asarray(edge_weight, np.float32).reshape(-1))
    nb = -(-num_nodes // tbr)  # row blocks
    nbc = -(-num_nodes // tb)  # column blocks
    rb = receivers // tbr
    cb = senders // tb
    # unique (block-row, block-col) pairs -> slot ranks within the row
    key = rb * nbc + cb
    uniq, inv = np.unique(key, return_inverse=True)
    if len(uniq) == 0:
        return None
    u_r = uniq // nbc
    u_c = uniq % nbc
    first = np.concatenate([[0], np.flatnonzero(np.diff(u_r)) + 1])
    gid = np.searchsorted(first, np.arange(len(uniq)), side="right") - 1
    rank = np.arange(len(uniq)) - first[gid]
    per_row = np.diff(np.concatenate([first, [len(uniq)]]))
    S = int(per_row.max())
    if S > max_slots:
        return None
    # pad slots point at a block whose stored content is zero: clamp the
    # row's own column index into the column-block range
    own = np.minimum(np.arange(nb, dtype=np.int64) * (tbr // tb)
                     if tbr >= tb else np.arange(nb, dtype=np.int64),
                     nbc - 1)
    cols = np.tile(own[:, None], (1, S))
    cols[u_r, rank] = u_c
    slot_of_edge = rank[inv]
    rloc = receivers - rb * tbr
    cloc = senders - cb * tb
    flat = ((slot_of_edge * nb + rb) * tbr + rloc) * tb + cloc
    shape = (S, nb, tbr, tb)
    jdtype = (jnp.bfloat16 if dtype in ("bfloat16", jnp.bfloat16)
              else jnp.dtype(dtype))
    total = int(np.prod(shape))
    if jax.default_backend() == "cpu":
        # host build (see build_banded: avoids eager-dispatch deadlocks on
        # tiny CPU hosts)
        host = np.zeros((total,), np.float32)
        np.add.at(host, flat, w)
        blocks = jnp.asarray(host.reshape(shape)).astype(jdtype)
    else:
        # ON-DEVICE scatter-add: the host->device transfer is O(E) edge
        # indices+weights, not the GB-scale block tensor — the axon relay
        # moves big tensors in minutes (same lesson as build_banded)
        blocks = jnp.zeros((total,), jnp.float32).at[
            jnp.asarray(flat, jnp.int32 if total < 2**31 else jnp.int64)
        ].add(jnp.asarray(w)).reshape(shape).astype(jdtype)
    return PackedBanded(blocks=blocks, cols=jnp.asarray(cols, jnp.int32),
                        nb=nb, tb=tb, num_nodes=num_nodes, tb_rows=tbr)


def packed_banded_spmm(pb: PackedBanded, x: jax.Array) -> jax.Array:
    """XLA reference: ``out[i] = Σ_s blocks[s, i] @ x_block[cols[i, s]]``."""
    tb, nb, tbr = pb.tb, pb.nb, pb.row_height
    nbc = pb.num_col_blocks
    n_pad_c = nbc * tb
    if x.shape[0] != n_pad_c:
        x = jnp.pad(x, ((0, n_pad_c - x.shape[0]), (0, 0)))
    cdt = (jnp.bfloat16 if pb.blocks.dtype == jnp.bfloat16 else x.dtype)
    xb = x.astype(cdt).reshape(nbc, tb, x.shape[1])
    out = jnp.zeros((nb, tbr, x.shape[1]), jnp.float32)
    S = pb.blocks.shape[0]
    for s in range(S):
        gathered = jnp.take(xb, pb.cols[:, s], axis=0)
        out = out + jnp.einsum("bij,bjf->bif",
                               pb.blocks[s].astype(cdt), gathered,
                               preferred_element_type=jnp.float32)
    return out.astype(x.dtype).reshape(nb * tbr, -1)[: pb.num_nodes]


def transpose_packed_banded(senders, receivers, num_nodes, *, tb=128,
                            tb_rows=None, edge_weight=None, max_slots=32,
                            dtype=np.float32):
    """Packed storage of Aᵀ (for VJPs): just the reversed edge list."""
    return build_packed_banded(receivers, senders, num_nodes, tb=tb,
                               tb_rows=tb_rows, edge_weight=edge_weight,
                               max_slots=max_slots, dtype=dtype)


def banded_spmm(bm: BandedMatrix, x: jax.Array) -> jax.Array:
    """``out = A @ x`` via one batched matmul per diagonal band."""
    tb, nb = bm.tb, bm.nb
    n_pad = nb * tb
    if x.shape[0] != n_pad:
        x = jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))
    cdt = (jnp.bfloat16 if bm.bands.dtype == jnp.bfloat16 else x.dtype)
    xb = x.astype(cdt).reshape(nb, tb, x.shape[1])
    out = jnp.zeros((nb, tb, x.shape[1]), jnp.float32)
    for k, d in enumerate(bm.offsets):
        # x block column i+d for each row i, zero-padded at the boundary
        if d == 0:
            shifted = xb
        elif d > 0:
            shifted = jnp.concatenate(
                [xb[d:], jnp.zeros((d, tb, x.shape[1]), cdt)], axis=0)
        else:
            shifted = jnp.concatenate(
                [jnp.zeros((-d, tb, x.shape[1]), cdt), xb[:d]], axis=0)
        out = out + jnp.einsum("bij,bjf->bif",
                               bm.bands[k].astype(cdt), shifted,
                               preferred_element_type=jnp.float32)
    return out.astype(x.dtype).reshape(n_pad, -1)[: bm.num_nodes]


def precompute_bsr(
    g: GnnGraph,
    *,
    tb: int = 256,
    edge_weight=None,
    max_density: float = 0.25,
    dtype=np.float32,
    dia: bool = True,
    max_bands: int = 16,
) -> GnnGraph:
    """Attach block storage to ``g.cache`` when the graph is block-sparse
    enough: diagonal-banded (``cache['banded']``, preferred — no product
    materialization) when few bands suffice, else packed BSR
    (``cache['bsr']``) under the density gate; unstructured graphs are
    returned unchanged (the gather paths stay in charge)."""
    if g.host_coo is not None:
        s, r = g.host_coo
    else:
        s, r = np.asarray(g.senders), np.asarray(g.receivers)
    from .dia import build_dia, build_dia_hybrid, plan_dia, transpose_dia

    # one offsets/counts pass decides full-vs-hybrid-vs-neither, then only
    # the CHOSEN representation pays its O(E) value fill + padded array
    # (advisor r3: the old flow always built both)
    plan = plan_dia(s, r, g.num_nodes) if dia else None
    # almost-DIA (e.g. periodic grids: stencil bulk + wrap edges): take the
    # DIA-main + tiny COO remainder split when full DIA can't ride the
    # stencil kernel at all, or when dropping the sparse far diagonals
    # shrinks the kernel's streamed x-window ≥4× (window traffic ∝ bandwidth)
    if plan is not None and plan.hybrid_ok and (
            not plan.full_ok or plan.full_bw > 8192
            or 4 * plan.hybrid_bw <= plan.full_bw):
        hyb = build_dia_hybrid(s, r, g.num_nodes, edge_weight=edge_weight,
                               dtype=dtype)
        if hyb is not None:
            dm_h, rs, rr, rw = hyb
            return g.copy(cache={
                **g.cache, "dia": dm_h, "dia_rev": transpose_dia(dm_h),
                "dia_rem": (jnp.asarray(rs), jnp.asarray(rr),
                            jnp.asarray(rw)),
            })
    if plan is not None and plan.full_ok and plan.full_bw <= 8192:
        # scalar-diagonal structure (regular grids / stencil meshes): one
        # value per edge, stencil kernel — strictly dominates the banded
        # block path when it applies (kernels/dia_kernels.py)
        dm = build_dia(s, r, g.num_nodes, edge_weight=edge_weight,
                       dtype=dtype)
        if dm is not None:
            return g.copy(cache={**g.cache, "dia": dm,
                                 "dia_rev": transpose_dia(dm)})
    # Row-packed block bands (TB=128) vs dense diagonals: the r5 reord
    # profile showed dense diagonals stream 811× zeros on post-RCM
    # unstructured meshes (bands dominate the kernel's traffic 2:1).
    # Estimate both footprints from the block-coordinate pairs and take
    # packed when it is ≥1.4× smaller, or when dense bands don't fit at
    # all; regular grids (full diagonals) keep DIA/banded.
    s64, r64 = np.asarray(s, np.int64), np.asarray(r, np.int64)
    ptb, ptb_r = 128, 512  # tall blocks: fewer grid steps, narrow columns
    nb_pr = -(-g.num_nodes // ptb_r)
    nb_pc = -(-g.num_nodes // ptb)
    pairs = np.unique((r64 // ptb_r) * nb_pc + s64 // ptb)
    per_row = np.bincount((pairs // nb_pc), minlength=nb_pr)
    S_est = int(per_row.max()) if len(pairs) else 0
    nb_d = -(-g.num_nodes // tb)
    n_offs_dense = len(np.unique(s64 // tb - r64 // tb))
    dense_fits = (n_offs_dense <= max_bands
                  and n_offs_dense < max((2 * nb_d - 1) // 2, 2))
    # compare FULL per-pass traffic (value stream + one x block-read per
    # band/slot) at a nominal F=128: packed re-reads narrow x blocks per
    # slot — counting values alone overstates its win
    F_NOM = 128
    packed_traffic = S_est * (nb_pr * ptb_r * ptb
                              + nb_pr * ptb * F_NOM)
    dense_traffic = n_offs_dense * (nb_d * tb * tb + g.num_nodes * F_NOM)
    # threshold 0.9: tall blocks also need FEWER grid steps than the dense
    # diagonals in this regime, so a modest modeled traffic win is enough
    use_packed = (0 < S_est <= min(32, (nb_pc - 1) // 2) and nb_pr >= 4
                  and (not dense_fits
                       or 10 * packed_traffic <= 9 * dense_traffic))
    if use_packed:
        pb = build_packed_banded(s, r, g.num_nodes, tb=ptb, tb_rows=ptb_r,
                                 edge_weight=edge_weight, dtype=dtype)
        if pb is not None:
            pb_rev = build_packed_banded(r, s, g.num_nodes, tb=ptb,
                                         tb_rows=ptb_r,
                                         edge_weight=edge_weight,
                                         dtype=dtype)
            return g.copy(cache={**g.cache, "pbanded": pb,
                                 "pbanded_rev": pb_rev})
    banded = build_banded(s, r, g.num_nodes, tb=tb, edge_weight=edge_weight,
                          dtype=dtype, max_bands=max_bands)
    if banded is not None:
        # Reversed-edge banded matrix = A^T: makes the Pallas streaming
        # kernel's backward pass a second streaming pass
        # (kernels/banded_kernels.py).
        banded_rev = build_banded(r, s, g.num_nodes, tb=tb,
                                  edge_weight=edge_weight, dtype=dtype,
                                  max_bands=max_bands)
        return g.copy(cache={**g.cache, "banded": banded,
                             "banded_rev": banded_rev})
    bsr = build_bsr(s, r, g.num_nodes, tb=tb, edge_weight=edge_weight,
                    dtype=dtype)
    if bsr.density > max_density:
        return g
    return g.copy(cache={**g.cache, "bsr": bsr})
