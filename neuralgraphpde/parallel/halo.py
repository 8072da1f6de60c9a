"""Distributed message passing over a device mesh (shard_map + collectives).

Each RHS evaluation on an edge-partitioned graph does:
  1. local per-node scaling / pre-multiplication (sharded rows, no comm),
  2. halo exchange of sender features — v1 uses a tiled ``all_gather`` over
     the ICI ring (every partition sees all node rows; XLA overlaps the
     gather with the local gather/scatter),
  3. local gather → (message) → masked segment-sum onto owned receivers.

This is the structural analog of sequence-parallel halo exchange (SURVEY
§5.7); the reference has no equivalent (single device).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .partition import PartitionedGraph

GRAPH_AXIS = "graph"


def make_mesh(num_devices: Optional[int] = None,
              axis_name: str = GRAPH_AXIS) -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    import numpy as np
    return Mesh(np.asarray(devs), (axis_name,))


def _local_spmm_block(x_block, senders_g, recv_l, emask, npp,
                      axis_name=GRAPH_AXIS):
    """Per-device body (all-gather variant): gather senders from the
    all-gathered table, mask padding, segment-sum onto owned receivers.
    Shapes inside shard_map carry a leading singleton device axis for the
    partition-major arrays."""
    x_full = jax.lax.all_gather(x_block, axis_name, axis=0, tiled=True)
    xj = jnp.take(x_full, senders_g[0], axis=0) * emask[0]
    return jax.ops.segment_sum(
        xj, recv_l[0], num_segments=npp, indices_are_sorted=True)


def _exchange_halo(send_rows, axis_name=GRAPH_AXIS, neighbor_only=False):
    """Deliver each device's per-peer halo blocks: ``send_rows`` is
    ``(P, H, F)`` (block ``q`` = rows for device ``q``); returns the same
    shape where block ``p`` = rows RECEIVED from device ``p``.

    ``neighbor_only=True`` (partition_graph detected that only adjacent
    partitions exchange rows — strip meshes): two neighbor ``ppermute``s
    ship 2·H rows per device instead of the dense all_to_all's (P-1)·H,
    keeping per-device ICI volume flat in P (examples/comm_model.py)."""
    if not neighbor_only:
        return jax.lax.all_to_all(send_rows, axis_name, split_axis=0,
                                  concat_axis=0, tiled=False)
    P_ = send_rows.shape[0]
    if P_ == 1:
        return jnp.zeros_like(send_rows)
    idx = jax.lax.axis_index(axis_name)
    # my blocks destined for my two neighbors (clamped picks are dummies
    # at the chain ends; the matching ppermute edge doesn't exist there)
    to_next = jax.lax.dynamic_index_in_dim(
        send_rows, jnp.minimum(idx + 1, P_ - 1), axis=0, keepdims=False)
    to_prev = jax.lax.dynamic_index_in_dim(
        send_rows, jnp.maximum(idx - 1, 0), axis=0, keepdims=False)
    from_prev = jax.lax.ppermute(
        to_next, axis_name, [(i, i + 1) for i in range(P_ - 1)])
    from_next = jax.lax.ppermute(
        to_prev, axis_name, [(i + 1, i) for i in range(P_ - 1)])
    # slot p of the table holds rows from device p: my neighbors' blocks
    # land at idx-1 / idx+1 (clamped writes at the chain ends target my
    # OWN slot, which senders_halo never references)
    tbl = jnp.zeros_like(send_rows)
    tbl = jax.lax.dynamic_update_slice_in_dim(
        tbl, from_prev[None], idx - 1, axis=0)
    tbl = jax.lax.dynamic_update_slice_in_dim(
        tbl, from_next[None], idx + 1, axis=0)
    return tbl


def _halo_table(x_block, send_idx_p, axis_name=GRAPH_AXIS,
                neighbor_only=False):
    """Targeted halo exchange: each device sends only the boundary rows its
    peers reference. Returns the local+halo row table
    ``[x_local; rows from dev 0; rows from dev 1; ...]`` matching the
    ``senders_halo`` remapping built at partition time."""
    send_rows = jnp.take(x_block, send_idx_p[0], axis=0)  # (P, H, F)
    recv = _exchange_halo(send_rows, axis_name, neighbor_only)
    return jnp.concatenate(
        [x_block, recv.reshape(-1, x_block.shape[-1])], axis=0)


def _local_spmm_block_halo(x_block, senders_h, recv_l, emask, send_idx_p,
                           npp, axis_name=GRAPH_AXIS, neighbor_only=False):
    table = _halo_table(x_block, send_idx_p, axis_name, neighbor_only)
    xj = jnp.take(table, senders_h[0], axis=0) * emask[0]
    return jax.ops.segment_sum(
        xj, recv_l[0], num_segments=npp, indices_are_sorted=True)


def _local_spmm_block_overlap(x_block, s_int, r_int, m_int, s_bnd, r_bnd,
                              m_bnd, send_idx_p, npp, axis_name=GRAPH_AXIS,
                              neighbor_only=False):
    """Interior/boundary-split aggregation (SURVEY §5.7 overlap plan): the
    all_to_all is issued first, the interior segment-sum (no data dependence
    on it) runs while it is in flight — XLA's latency-hiding scheduler
    overlaps them — and only the short boundary pass consumes the received
    halo rows."""
    send_rows = jnp.take(x_block, send_idx_p[0], axis=0)  # (P, H, F)
    halo_rows = _exchange_halo(send_rows, axis_name, neighbor_only)
    xj_i = jnp.take(x_block, s_int[0], axis=0) * m_int[0]
    out = jax.ops.segment_sum(
        xj_i, r_int[0], num_segments=npp, indices_are_sorted=True)
    tbl = halo_rows.reshape(-1, x_block.shape[-1])
    xj_b = jnp.take(tbl, s_bnd[0], axis=0) * m_bnd[0]
    out = out + jax.ops.segment_sum(
        xj_b, r_bnd[0], num_segments=npp, indices_are_sorted=True)
    return out


def _local_spmm_block_tiled(x_block, send_idx_p, ts, tr, tw, tc,
                            tn, te, npp, axis_name=GRAPH_AXIS,
                            neighbor_only=False):
    """Halo exchange + per-device Pallas tiled-CSR kernel (the multi-chip
    fast path; partition_graph(tiled=True))."""
    from ..kernels.segment_kernels import TiledCSR, tiled_segment_spmm

    table = _halo_table(x_block, send_idx_p, axis_name, neighbor_only)
    tcsr = TiledCSR(
        senders=ts[0], recv_local=tr[0], wmask=tw[0], chunk_tile=tc[0],
        num_tiles=-(-npp // tn), tn=tn, te=te, num_nodes=npp)
    return tiled_segment_spmm(table, tcsr, None)[:npp]


def _local_spmm_block_dia_overlap(x_block, vals, vals_rev, s_bnd, r_bnd,
                                  m_bnd, send_idx_p, npp, offsets,
                                  axis_name=GRAPH_AXIS, neighbor_only=False):
    """Interior aggregation on the DIA stencil kernel while the all_to_all
    is in flight; boundary edges consume the received halo rows
    (partition_graph(dia=True) on strip-partitioned stencil meshes — the
    fastest multi-chip path)."""
    from ..kernels.dia_kernels import dia_spmm_pallas
    from ..ops.dia import DiaMatrix, dia_spmm
    from ..ops.spmm import _pallas_available, get_spmm_mode

    send_rows = jnp.take(x_block, send_idx_p[0], axis=0)
    halo_rows = _exchange_halo(send_rows, axis_name, neighbor_only)
    dm = DiaMatrix(values=vals[0], offsets=offsets, num_nodes=npp)
    dm_rev = None
    if vals_rev is not None:
        dm_rev = DiaMatrix(values=vals_rev[0], offsets=offsets,
                           num_nodes=npp)
    mode = get_spmm_mode()
    if mode in ("pallas", "bsr") or (mode == "auto" and _pallas_available()):
        out = dia_spmm_pallas(x_block, dm, dm_rev)
    else:
        # XLA stencil (shifted slices) — same DIA structure, no Pallas;
        # keeps CPU/virtual-mesh runs on the partitioned-DIA path
        out = dia_spmm(dm, x_block)
    tbl = halo_rows.reshape(-1, x_block.shape[-1])
    xj_b = jnp.take(tbl, s_bnd[0], axis=0) * m_bnd[0]
    return out + jax.ops.segment_sum(
        xj_b, r_bnd[0], num_segments=npp, indices_are_sorted=True)


def _local_spmm_block_banded_overlap(x_block, band, band_rev, s_bnd, r_bnd,
                                     m_bnd, send_idx_p, npp, offsets, tb,
                                     axis_name=GRAPH_AXIS,
                                     neighbor_only=False):
    """Interior aggregation on the streaming banded kernel while the
    all_to_all is in flight; boundary edges consume the received halo rows
    (partition_graph(banded_tb=...) — the multi-chip mesh fast path)."""
    from ..kernels.banded_kernels import banded_spmm_pallas
    from ..ops.bsr import BandedMatrix

    send_rows = jnp.take(x_block, send_idx_p[0], axis=0)
    halo_rows = _exchange_halo(send_rows, axis_name, neighbor_only)
    nb = band.shape[2]
    bm = BandedMatrix(bands=band[0], offsets=offsets, nb=nb, tb=tb,
                      num_nodes=npp)
    bm_rev = None
    if band_rev is not None:
        bm_rev = BandedMatrix(bands=band_rev[0], offsets=offsets, nb=nb,
                              tb=tb, num_nodes=npp)
    out = banded_spmm_pallas(x_block, bm, bm_rev)
    tbl = halo_rows.reshape(-1, x_block.shape[-1])
    xj_b = jnp.take(tbl, s_bnd[0], axis=0) * m_bnd[0]
    out = out + jax.ops.segment_sum(
        xj_b, r_bnd[0], num_segments=npp, indices_are_sorted=True)
    return out


def _local_spmm_block_pbanded_overlap(x_block, blocks, blocks_rev, cols,
                                      cols_rev, s_bnd, r_bnd, m_bnd,
                                      send_idx_p, npp, tb, tbr,
                                      axis_name=GRAPH_AXIS,
                                      neighbor_only=False):
    """Interior aggregation on the PACKED block-band kernel while the halo
    collective is in flight (r5: the distributed fast path for partitions
    of RCM-ordered unstructured meshes); boundary edges consume the
    received halo rows."""
    from ..kernels.banded_kernels import pbanded_spmm_pallas
    from ..ops.bsr import PackedBanded, packed_banded_spmm
    from ..ops.spmm import _pallas_available, get_spmm_mode

    send_rows = jnp.take(x_block, send_idx_p[0], axis=0)
    halo_rows = _exchange_halo(send_rows, axis_name, neighbor_only)
    nbr = blocks.shape[2]
    pb = PackedBanded(blocks=blocks[0], cols=cols[0], nb=nbr, tb=tb,
                      num_nodes=npp, tb_rows=tbr)
    pb_rev = PackedBanded(blocks=blocks_rev[0], cols=cols_rev[0], nb=nbr,
                          tb=tb, num_nodes=npp, tb_rows=tbr)
    mode = get_spmm_mode()
    if mode in ("pallas", "bsr") or (mode == "auto" and _pallas_available()):
        out = pbanded_spmm_pallas(x_block, pb, pb_rev)
    else:
        # XLA packed evaluation — keeps CPU/virtual-mesh runs on the path
        out = packed_banded_spmm(pb, x_block)
    tbl = halo_rows.reshape(-1, x_block.shape[-1])
    xj_b = jnp.take(tbl, s_bnd[0], axis=0) * m_bnd[0]
    return out + jax.ops.segment_sum(
        xj_b, r_bnd[0], num_segments=npp, indices_are_sorted=True)


def sharded_spmm(
    pg: PartitionedGraph,
    x: jax.Array,
    mesh: Mesh,
    axis_name: str = GRAPH_AXIS,
    feature_axis: Optional[str] = None,
) -> jax.Array:
    """Distributed ``out[i] = Σ_{j→i} x[j]`` over row-sharded features.

    ``x``: (padded_nodes, F) sharded ``P(axis_name, feature_axis)``. Returns
    the same sharding. Uses the targeted all_to_all halo when the partition
    carries the metadata; all_gather otherwise. With per-partition bands
    (``partition_graph(banded_tb=...)``) the interior aggregation runs on
    the Pallas streaming banded kernel.

    ``feature_axis`` names a SECOND mesh axis sharding the feature columns
    (2-D graph x model layout): the aggregation is independent per column,
    so each model shard runs the same per-partition body on its F/size
    columns and the halo all_to_all stays entirely on ``axis_name`` — no
    cross-axis collective is ever needed.
    """
    npp = pg.nodes_per_part
    xs = P(axis_name, feature_axis)

    if pg.dia_values is not None:
        offsets = pg.dia_offsets

        def body(x_block, vals, vals_rev, s_bnd, r_bnd, m_bnd, send_idx):
            return _local_spmm_block_dia_overlap(
                x_block, vals, vals_rev, s_bnd, r_bnd, m_bnd, send_idx, npp,
                offsets, axis_name, pg.halo_neighbor_only)

        dia_spec = P(axis_name, None, None)
        f = jax.shard_map(
            body, mesh=mesh,
            in_specs=(xs, dia_spec, dia_spec,
                      P(axis_name, None), P(axis_name, None),
                      P(axis_name, None, None), P(axis_name, None, None)),
            out_specs=xs, check_vma=False)
        return f(x, pg.dia_values, pg.dia_values_rev, pg.senders_bnd,
                 pg.recv_bnd, pg.mask_bnd, pg.send_idx)

    if pg.pband_blocks is not None:
        ptb, ptbr = pg.pband_tb, pg.pband_tb_rows

        def body(x_block, blocks, blocks_rev, cols, cols_rev, s_bnd, r_bnd,
                 m_bnd, send_idx):
            return _local_spmm_block_pbanded_overlap(
                x_block, blocks, blocks_rev, cols, cols_rev, s_bnd, r_bnd,
                m_bnd, send_idx, npp, ptb, ptbr, axis_name,
                pg.halo_neighbor_only)

        blk_spec = P(axis_name, *(None,) * 4)
        col_spec = P(axis_name, None, None)
        f = jax.shard_map(
            body, mesh=mesh,
            in_specs=(xs, blk_spec, blk_spec, col_spec, col_spec,
                      P(axis_name, None), P(axis_name, None),
                      P(axis_name, None, None), P(axis_name, None, None)),
            out_specs=xs, check_vma=False)
        return f(x, pg.pband_blocks, pg.pband_blocks_rev, pg.pband_cols,
                 pg.pband_cols_rev, pg.senders_bnd, pg.recv_bnd,
                 pg.mask_bnd, pg.send_idx)

    if pg.band_data is not None:
        offsets, tb = pg.band_offsets, pg.band_tb
        has_rev = pg.band_data_rev is not None

        def body(x_block, band, *rest):
            band_rev, rest = (rest[0], rest[1:]) if has_rev else (None, rest)
            s_bnd, r_bnd, m_bnd, send_idx = rest
            return _local_spmm_block_banded_overlap(
                x_block, band, band_rev, s_bnd, r_bnd, m_bnd, send_idx, npp,
                offsets, tb, axis_name, pg.halo_neighbor_only)

        band_spec = P(axis_name, *(None,) * 4)
        specs = ((xs, band_spec)
                 + ((band_spec,) if has_rev else ())
                 + (P(axis_name, None), P(axis_name, None),
                    P(axis_name, None, None), P(axis_name, None, None)))
        args = ((x, pg.band_data)
                + ((pg.band_data_rev,) if has_rev else ())
                + (pg.senders_bnd, pg.recv_bnd, pg.mask_bnd, pg.send_idx))
        f = jax.shard_map(body, mesh=mesh, in_specs=specs,
                          out_specs=xs, check_vma=False)
        return f(*args)

    if pg.tile_senders is not None:
        tn, te = pg.tile_tn, pg.tile_te

        def body(x_block, send_idx, ts, tr, tw, tc):
            return _local_spmm_block_tiled(x_block, send_idx, ts, tr, tw, tc,
                                           tn, te, npp, axis_name,
                                           pg.halo_neighbor_only)

        f = jax.shard_map(
            body, mesh=mesh,
            in_specs=(xs, P(axis_name, None, None),
                      P(axis_name, None, None), P(axis_name, None, None),
                      P(axis_name, None, None), P(axis_name, None)),
            out_specs=xs,
            # pallas_call inside shard_map can't express varying-mesh-axes
            # metadata on its out_shape yet
            check_vma=False,
        )
        return f(x, pg.send_idx, pg.tile_senders, pg.tile_recv,
                 pg.tile_wmask, pg.tile_chunk)

    if pg.senders_int is not None:
        # overlapped interior/boundary split (preferred halo path)
        def body(x_block, s_int, r_int, m_int, s_bnd, r_bnd, m_bnd, send_idx):
            return _local_spmm_block_overlap(
                x_block, s_int, r_int, m_int, s_bnd, r_bnd, m_bnd, send_idx,
                npp, axis_name, pg.halo_neighbor_only)

        f = jax.shard_map(
            body, mesh=mesh,
            in_specs=(xs, P(axis_name, None),
                      P(axis_name, None), P(axis_name, None, None),
                      P(axis_name, None), P(axis_name, None),
                      P(axis_name, None, None), P(axis_name, None, None)),
            out_specs=xs,
        )
        return f(x, pg.senders_int, pg.recv_int, pg.mask_int, pg.senders_bnd,
                 pg.recv_bnd, pg.mask_bnd, pg.send_idx)

    if pg.senders_halo is not None:
        def body(x_block, senders_h, recv_l, emask, send_idx):
            return _local_spmm_block_halo(x_block, senders_h, recv_l, emask,
                                          send_idx, npp, axis_name,
                                          pg.halo_neighbor_only)

        f = jax.shard_map(
            body, mesh=mesh,
            in_specs=(xs, P(axis_name, None),
                      P(axis_name, None), P(axis_name, None, None),
                      P(axis_name, None, None)),
            out_specs=xs,
        )
        return f(x, pg.senders_halo, pg.receivers_local, pg.edge_mask,
                 pg.send_idx)

    def body(x_block, senders_g, recv_l, emask):
        return _local_spmm_block(x_block, senders_g, recv_l, emask, npp,
                                 axis_name)

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(xs, P(axis_name, None), P(axis_name, None),
                  P(axis_name, None, None)),
        out_specs=xs,
    )
    return f(x, pg.senders_global, pg.receivers_local, pg.edge_mask)


def sharded_gcn_forward(
    pg: PartitionedGraph,
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array],
    mesh: Mesh,
    *,
    activation: Callable = lambda v: v,
    axis_name: str = GRAPH_AXIS,
) -> jax.Array:
    """Distributed GCNConv forward on a pre-self-looped partitioned graph:
    symmetric degree normalization, SpMM with halo exchange, affine + act.

    Semantics match the single-device layer (reference src/layers.jl:200-239)
    including the out<in pre-multiply optimization — the pre-multiply also
    shrinks the halo-exchange payload, so it is doubly right on TPU.
    """
    in_dims, out_dims = weight.shape
    npp = pg.nodes_per_part
    use_dia = pg.dia_values is not None
    use_pbanded = pg.pband_blocks is not None
    use_banded = pg.band_data is not None
    use_overlap = pg.senders_int is not None
    use_halo = pg.senders_halo is not None

    def pre(x_block, deg):
        c = jnp.where(deg > 0, 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-30)),
                      0.0)[:, None]
        h = x_block
        if out_dims < in_dims:
            h = jnp.dot(h, weight, preferred_element_type=h.dtype)
        return h * c, c

    def post(agg, c, nmask):
        agg = agg * c
        if out_dims >= in_dims:
            agg = jnp.dot(agg, weight, preferred_element_type=agg.dtype)
        if bias is not None:
            agg = agg + bias
        return activation(agg) * nmask

    if use_dia:
        offsets = pg.dia_offsets

        def body(x_block, deg, nmask, vals, vals_rev, s_bnd, r_bnd, m_bnd,
                 send_idx):
            h, c = pre(x_block, deg[0])
            agg = _local_spmm_block_dia_overlap(
                h, vals, vals_rev, s_bnd, r_bnd, m_bnd, send_idx, npp,
                offsets, axis_name, pg.halo_neighbor_only)
            return post(agg, c, nmask[0])

        dia_spec = P(axis_name, None, None)
        f = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(axis_name, None), P(axis_name, None),
                      P(axis_name, None, None), dia_spec, dia_spec,
                      P(axis_name, None), P(axis_name, None),
                      P(axis_name, None, None), P(axis_name, None, None)),
            out_specs=P(axis_name, None), check_vma=False)
        return f(x, pg.in_degree, pg.node_mask, pg.dia_values,
                 pg.dia_values_rev, pg.senders_bnd, pg.recv_bnd, pg.mask_bnd,
                 pg.send_idx)

    if use_pbanded:
        ptb, ptbr = pg.pband_tb, pg.pband_tb_rows

        def body(x_block, deg, nmask, blocks, blocks_rev, cols, cols_rev,
                 s_bnd, r_bnd, m_bnd, send_idx):
            h, c = pre(x_block, deg[0])
            agg = _local_spmm_block_pbanded_overlap(
                h, blocks, blocks_rev, cols, cols_rev, s_bnd, r_bnd, m_bnd,
                send_idx, npp, ptb, ptbr, axis_name, pg.halo_neighbor_only)
            return post(agg, c, nmask[0])

        blk_spec = P(axis_name, *(None,) * 4)
        col_spec = P(axis_name, None, None)
        f = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(axis_name, None), P(axis_name, None),
                      P(axis_name, None, None), blk_spec, blk_spec,
                      col_spec, col_spec,
                      P(axis_name, None), P(axis_name, None),
                      P(axis_name, None, None), P(axis_name, None, None)),
            out_specs=P(axis_name, None), check_vma=False)
        return f(x, pg.in_degree, pg.node_mask, pg.pband_blocks,
                 pg.pband_blocks_rev, pg.pband_cols, pg.pband_cols_rev,
                 pg.senders_bnd, pg.recv_bnd, pg.mask_bnd, pg.send_idx)

    if use_banded:
        offsets, tb = pg.band_offsets, pg.band_tb
        has_rev = pg.band_data_rev is not None

        def body(x_block, deg, nmask, band, *rest):
            band_rev, rest = (rest[0], rest[1:]) if has_rev else (None, rest)
            s_bnd, r_bnd, m_bnd, send_idx = rest
            h, c = pre(x_block, deg[0])
            agg = _local_spmm_block_banded_overlap(
                h, band, band_rev, s_bnd, r_bnd, m_bnd, send_idx, npp,
                offsets, tb, axis_name, pg.halo_neighbor_only)
            return post(agg, c, nmask[0])

        band_spec = P(axis_name, *(None,) * 4)
        specs = ((P(axis_name, None), P(axis_name, None),
                  P(axis_name, None, None), band_spec)
                 + ((band_spec,) if has_rev else ())
                 + (P(axis_name, None), P(axis_name, None),
                    P(axis_name, None, None), P(axis_name, None, None)))
        args = ((x, pg.in_degree, pg.node_mask, pg.band_data)
                + ((pg.band_data_rev,) if has_rev else ())
                + (pg.senders_bnd, pg.recv_bnd, pg.mask_bnd, pg.send_idx))
        f = jax.shard_map(body, mesh=mesh, in_specs=specs,
                          out_specs=P(axis_name, None), check_vma=False)
        return f(*args)

    if use_overlap:
        def body(x_block, deg, nmask, s_int, r_int, m_int, s_bnd, r_bnd,
                 m_bnd, send_idx):
            h, c = pre(x_block, deg[0])
            agg = _local_spmm_block_overlap(h, s_int, r_int, m_int, s_bnd,
                                            r_bnd, m_bnd, send_idx, npp,
                                            axis_name,
                                            pg.halo_neighbor_only)
            return post(agg, c, nmask[0])

        f = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(axis_name, None), P(axis_name, None),
                      P(axis_name, None, None), P(axis_name, None),
                      P(axis_name, None), P(axis_name, None, None),
                      P(axis_name, None), P(axis_name, None),
                      P(axis_name, None, None), P(axis_name, None, None)),
            out_specs=P(axis_name, None),
        )
        return f(x, pg.in_degree, pg.node_mask, pg.senders_int, pg.recv_int,
                 pg.mask_int, pg.senders_bnd, pg.recv_bnd, pg.mask_bnd,
                 pg.send_idx)

    def body(x_block, senders, recv_l, emask, deg, nmask, *rest):
        h, c = pre(x_block, deg[0])
        if use_halo:
            agg = _local_spmm_block_halo(h, senders, recv_l, emask, rest[0],
                                         npp, axis_name,
                                         pg.halo_neighbor_only)
        else:
            agg = _local_spmm_block(h, senders, recv_l, emask, npp, axis_name)
        return post(agg, c, nmask[0])

    base_specs = (P(axis_name, None), P(axis_name, None), P(axis_name, None),
                  P(axis_name, None, None), P(axis_name, None),
                  P(axis_name, None, None))
    if use_halo:
        f = jax.shard_map(
            body, mesh=mesh,
            in_specs=base_specs + (P(axis_name, None, None),),
            out_specs=P(axis_name, None),
        )
        return f(x, pg.senders_halo, pg.receivers_local, pg.edge_mask,
                 pg.in_degree, pg.node_mask, pg.send_idx)
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=base_specs,
        out_specs=P(axis_name, None),
    )
    return f(x, pg.senders_global, pg.receivers_local, pg.edge_mask,
             pg.in_degree, pg.node_mask)


def sharded_propagate(
    pg: PartitionedGraph,
    message,
    x: jax.Array,
    mesh: Mesh,
    *,
    aggr: str = "sum",
    axis_name: str = GRAPH_AXIS,
    fused_phi=None,
) -> jax.Array:
    """Distributed custom-message propagate over an edge-partitioned graph.

    ``message(xi, xj, e)`` receives edge-expanded arrays (xi from local
    receiver rows, xj through the targeted halo table, e a dict of
    per-partition edge features) and returns per-edge messages, which are
    masked and segment-reduced onto owned receivers. Requires a ``halo=True``
    partition. The distributed generalization of ``ops.propagate`` for the
    custom-message layers (ExplicitEdgeConv/VMHConv/MPPDEConv/GNOConv).

    ``fused_phi=(phi, phi_ps, feats_fn)`` routes the message MLP through the
    fused edge-MLP Pallas kernel PER PARTITION (the multi-chip analog of the
    single-device ``nn.conv._try_fused_phi`` path): ``feats_fn(xi, xj, e)``
    builds the per-edge input features in XLA and ϕ runs entirely in VMEM
    inside shard_map. Engages when the partition carries edge tilings
    (``partition_graph(tiled=True)``), ϕ is a Dense stack with static
    activations, and ``aggr`` is sum/mean — else this argument is ignored
    and ``message`` takes the exact path.
    """
    if pg.senders_halo is None:
        raise ValueError("sharded_propagate requires partition_graph(halo=True)")
    if (fused_phi is not None and pg.etile_senders is not None
            and aggr in ("sum", "mean")):
        from ..nn.conv import fused_phi_plan
        from ..ops.spmm import _pallas_available, get_spmm_mode

        mode = get_spmm_mode()
        if mode == "pallas" or (mode == "auto" and _pallas_available()):
            phi, phi_ps, feats_fn = fused_phi
            plan = fused_phi_plan(phi, phi_ps, aggr)
            if plan is not None:
                return _sharded_propagate_fused(
                    pg, feats_fn, plan, x, mesh, aggr, axis_name)
    if aggr not in ("sum", "mean", "max", "min", "prod"):
        raise ValueError(
            "distributed aggr supports 'sum'/'mean'/'max'/'min'/'prod'")
    npp = pg.nodes_per_part
    ekeys = list(pg.edata)

    # Edges are partitioned by receiver owner, so every node's full in-edge
    # set is local to one partition: non-sum reductions need no cross-device
    # combine — only the right identity element on padding edges. Empty
    # segments follow the jax.ops convention (±inf / 1), matching the
    # single-device ``segment_reduce`` path.
    def body(x_block, senders_h, recv_l, emask, send_idx, deg, *eblocks):
        table = _halo_table(x_block, send_idx, axis_name,
                            pg.halo_neighbor_only)
        xj = jnp.take(table, senders_h[0], axis=0)
        xi = jnp.take(x_block, recv_l[0], axis=0)
        e = {k: b[0] for k, b in zip(ekeys, eblocks)}
        m = message(xi, xj, e)
        mask = emask[0] > 0
        if aggr in ("sum", "mean"):
            m = m * emask[0]
            out = jax.ops.segment_sum(m, recv_l[0], num_segments=npp,
                                      indices_are_sorted=True)
            if aggr == "mean":
                out = out / jnp.maximum(deg[0], 1.0)[:, None]
        elif aggr == "max":
            m = jnp.where(mask, m, -jnp.inf)
            out = jax.ops.segment_max(m, recv_l[0], num_segments=npp,
                                      indices_are_sorted=True)
        elif aggr == "min":
            m = jnp.where(mask, m, jnp.inf)
            out = jax.ops.segment_min(m, recv_l[0], num_segments=npp,
                                      indices_are_sorted=True)
        else:  # prod
            m = jnp.where(mask, m, 1.0)
            out = jax.ops.segment_prod(m, recv_l[0], num_segments=npp,
                                       indices_are_sorted=True)
        return out

    espec = tuple(P(axis_name, None, None) for _ in ekeys)
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None), P(axis_name, None),
                  P(axis_name, None, None), P(axis_name, None, None),
                  P(axis_name, None)) + espec,
        out_specs=P(axis_name, None),
    )
    return f(x, pg.senders_halo, pg.receivers_local, pg.edge_mask,
             pg.send_idx, pg.in_degree, *[pg.edata[k] for k in ekeys])


def _sharded_propagate_fused(pg: PartitionedGraph, feats_fn, plan,
                             x: jax.Array, mesh: Mesh, aggr: str,
                             axis_name: str) -> jax.Array:
    """Per-partition fused edge-MLP propagate: halo exchange → XLA feature
    concat → ϕ + segment-reduce in ONE Pallas program per edge chunk
    (kernels/fused_mlp_kernels.py, fwd AND bwd fused), keeping single-chip
    kernel throughput for the VMH/MPPDE RHS at scale (r3 VERDICT item 4).
    Padding edge slots carry tiling weight 0, so no mask pass is needed; the
    post epilogue (mean normalization / split-off linear layer) uses the
    partition's true in-degrees, zero on padded nodes."""
    from ..kernels.fused_mlp_kernels import fused_mlp_aggregate
    from ..kernels.segment_kernels import TiledCSR
    from ..nn.conv import fused_phi_post

    acts, ws, bs, post = plan
    has_post = post is not None
    npp = pg.nodes_per_part
    tn, te = pg.tile_tn, pg.tile_te
    num_tiles = -(-npp // tn)
    ekeys = list(pg.edata)

    def body(x_block, senders_h, recv_l, send_idx, deg, es, er, ew, ec,
             ws_, bs_, post_, *eblocks):
        table = _halo_table(x_block, send_idx, axis_name,
                            pg.halo_neighbor_only)
        xj = jnp.take(table, senders_h[0], axis=0)
        xi = jnp.take(x_block, recv_l[0], axis=0)
        e = {k: b[0] for k, b in zip(ekeys, eblocks)}
        feats = feats_fn(xi, xj, e)
        tcsr = TiledCSR(senders=es[0], recv_local=er[0], wmask=ew[0],
                        chunk_tile=ec[0], num_tiles=num_tiles, tn=tn, te=te,
                        num_nodes=npp)
        reduced = fused_mlp_aggregate(acts, feats, ws_, bs_, tcsr)[:npp]
        return fused_phi_post(reduced, post_ if has_post else None,
                              deg[0], aggr)

    post_ps = post if has_post else {}
    espec = tuple(P(axis_name, None, None) for _ in ekeys)
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None), P(axis_name, None),
                  P(axis_name, None, None), P(axis_name, None),
                  P(axis_name, None, None), P(axis_name, None, None),
                  P(axis_name, None, None), P(axis_name, None),
                  P(), P(), P()) + espec,
        out_specs=P(axis_name, None),
        check_vma=False,  # pallas_call inside the body can't declare vma
    )
    return f(x, pg.senders_halo, pg.receivers_local, pg.send_idx,
             pg.in_degree, pg.etile_senders, pg.etile_recv, pg.etile_wmask,
             pg.etile_chunk, ws, bs, post_ps,
             *[pg.edata[k] for k in ekeys])


def shard_node_features(x, pg: PartitionedGraph, mesh: Mesh,
                        axis_name: str = GRAPH_AXIS):
    """Place (padded_nodes, F) features row-sharded on the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(axis_name, None)))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))
