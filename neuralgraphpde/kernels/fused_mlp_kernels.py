"""Fused edge-MLP + segment-reduce (Pallas TPU) — the generic ϕ fusion.

The custom-message layers (ExplicitEdgeConv / VMHConv / MPPDEConv, reference
src/layers.jl:111,326,416) compute ``m_e = ϕ(feats_e)`` over every edge and
segment-reduce onto receivers. Done layer-by-layer in XLA, every hidden
activation of ϕ round-trips HBM (~2·Σ K_l floats per edge — the dominant
traffic; the matmuls themselves are tiny). This kernel runs the ENTIRE MLP
inside one Pallas program per edge chunk: the chunk's activations and all of
ϕ's weights live in VMEM, and the only HBM traffic is the narrow edge-input
gather plus the node-tile output.

Reduction rides the one-hot-MXU trick of ``segment_kernels``: the chunk
layout (``TiledCSR`` built over EDGE indices) guarantees a chunk never
straddles an output node tile, so ``out_tile += onehot(recv_local)ᵀ @ h``
accumulates across a tile's chunks.

Callers additionally exploit linearity: when ϕ ends in a bias-bearing Dense
with identity activation, the kernel reduces the PENULTIMATE activations and
the last layer is applied after the reduce (``Σ(h@W+b) = (Σh)@W + deg·b``) —
an E/N-fold FLOP saving on that layer (see ``nn.conv._phi_aggregate``).

Backward is a recomputation — but also fused: a second Pallas kernel
re-runs the per-edge MLP for its chunk inside VMEM, backprops layer by
layer in registers, and accumulates the weight/bias gradients across the
(sequential) TPU grid into revisited output blocks. Hidden activations
never exist in HBM in either direction; the only backward HBM traffic is
the per-edge input-gradient chunk write and the ``g_out`` node-tile reads.
(The pre-r3 XLA recompute backward is kept as ``_bwd_xla`` for A/B.)
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .segment_kernels import TiledCSR, _zeros_like_tree

# Activations representable inside the kernel (static names only; callables
# can't be staged into the Pallas program).
_ACTS = {
    "identity": lambda x: x,
    "relu": lambda x: jnp.maximum(x, 0.0),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "swish": jax.nn.swish,
    "silu": jax.nn.silu,
}


def supported_activation(name) -> bool:
    return name is None or (isinstance(name, str) and name in _ACTS)


def _xla_dot_precision(dtype):
    """Matmul precision for the XLA (non-Pallas) ϕ backends.

    TPU default-precision matmuls truncate f32 operands to bf16 — the r2
    lesson the Pallas kernels already encode (they request HIGHEST for
    f32). The XLA saved-activation / recompute paths must match, or the
    grad-context forward silently differs from the HIGHEST-precision
    Pallas inference forward. bf16 inputs stay on the native single-pass
    path. ``NGPDE_XLA_PRECISION=default`` opts a run out (6× fewer MXU
    passes for f32; used by the r5 VMH protocol run for consistency with
    the r4 P1/P2 probe evidence, which was gathered pre-fix)."""
    if os.environ.get("NGPDE_XLA_PRECISION", "highest").lower() == "default":
        return None
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(dtype) == jnp.float32 else None)


def _act(name):
    return _ACTS["identity" if name is None else name]


def _make_kernel(acts: Tuple[Optional[str], ...]):
    n = len(acts)

    def kernel(chunk_tile_ref, feats_ref, recv_ref, wmask_ref, *rest):
        w_refs, b_refs, out_ref = rest[:n], rest[n:2 * n], rest[2 * n]
        c = pl.program_id(0)
        prev_tile = chunk_tile_ref[jnp.maximum(c, 1) - 1]
        first = (c == 0) | (chunk_tile_ref[c] != prev_tile)

        @pl.when(first)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # f32 MXU ops must request HIGHEST precision (the default truncates
        # operands to bf16; see tests/tpu_compiled_checks.py).
        prec = (jax.lax.Precision.HIGHEST
                if feats_ref.dtype == jnp.float32 else None)
        h = feats_ref[0].astype(jnp.float32)  # (TE, Fin)
        for w_ref, b_ref, act in zip(w_refs, b_refs, acts):
            h = jnp.dot(h, w_ref[...].astype(jnp.float32),
                        preferred_element_type=jnp.float32, precision=prec)
            h = _act(act)(h + b_ref[...])

        tn = out_ref.shape[0]
        te = recv_ref.shape[1]
        recv = recv_ref[0]  # (TE, 1)
        w = wmask_ref[0]  # (TE, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (te, tn), 1)
        onehot = jnp.where(cols == recv, w, 0.0)
        out_ref[:] += jax.lax.dot_general(
            onehot, h, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    return kernel


@functools.partial(jax.jit, static_argnames=("acts", "interpret"))
def _fused_mlp_fwd(acts, tiling: TiledCSR, feats: jax.Array,
                   ws: Tuple[jax.Array, ...], bs: Tuple[jax.Array, ...],
                   interpret: bool = False) -> jax.Array:
    """out (num_tiles*tn, K_out) = Σ_{e→n} w_e · MLP(feats_e), MLP in VMEM.

    ``tiling`` must be the EDGE-index layout (``g.cache['tcsr_edges']``):
    its ``senders`` are edge ids, so gathering ``feats`` through them aligns
    chunk slots with receiver/wmask."""
    C, te = tiling.senders.shape
    fin = feats.shape[1]
    n = len(ws)

    eidx = tiling.senders.reshape(-1)
    feats_c = jnp.take(feats, eidx, axis=0).reshape(C, te, fin)
    recv3 = tiling.recv_local.reshape(C, te, 1)
    wmask3 = tiling.wmask.reshape(C, te, 1)

    in_specs = [
        pl.BlockSpec((1, te, fin), lambda c, ct: (c, 0, 0)),
        pl.BlockSpec((1, te, 1), lambda c, ct: (c, 0, 0)),
        pl.BlockSpec((1, te, 1), lambda c, ct: (c, 0, 0)),
    ]
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, lambda c, ct: (0, 0)))
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, lambda c, ct: (0, 0)))

    k_out = ws[-1].shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tiling.tn, k_out), lambda c, ct: (ct[c], 0)),
    )
    out = pl.pallas_call(
        _make_kernel(acts),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (tiling.num_tiles * tiling.tn, k_out), jnp.float32),
        interpret=interpret,
    )(tiling.chunk_tile, feats_c, recv3, wmask3, *ws, *bs)
    return out.astype(feats.dtype)


def _make_bwd_kernel(acts: Tuple[Optional[str], ...]):
    """Backward program for one edge chunk: recompute ϕ's activations in
    VMEM, pull the chunk's output-gradient rows off the node tile with the
    same one-hot MXU trick, then reverse through the layers. ``dws``/``dbs``
    output blocks map every grid step to block 0 — the TPU grid is
    sequential, so ``+=`` accumulates across chunks (initialized at c==0)."""
    n = len(acts)

    def kernel(chunk_tile_ref, feats_ref, recv_ref, wmask_ref, *rest):
        w_refs = rest[:n]
        g_ref = rest[2 * n]  # (tn, K_out) tile of the output cotangent
        dfeats_ref = rest[2 * n + 1]
        dw_refs = rest[2 * n + 2:2 * n + 2 + n]
        db_refs = rest[2 * n + 2 + n:2 * n + 2 + 2 * n]
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            for dw in dw_refs:
                dw[...] = jnp.zeros_like(dw)
            for db in db_refs:
                db[...] = jnp.zeros_like(db)

        # HIGHEST only for true-f32 inputs (the r2 truncation lesson);
        # bf16-policy inputs take the 1-pass MXU rate — the operands are
        # bf16-rounded anyway, so 6-pass f32 buys nothing but 6x the FLOPs
        prec = (jax.lax.Precision.HIGHEST
                if feats_ref.dtype == jnp.float32 else None)

        # forward recompute, keeping every activation in registers/VMEM
        h = feats_ref[0].astype(jnp.float32)  # (TE, Fin)
        hs = [h]
        avjps = []
        for w_ref, b_ref, act in zip(w_refs, rest[n:2 * n], acts):
            z = jnp.dot(h, w_ref[...].astype(jnp.float32),
                        preferred_element_type=jnp.float32,
                        precision=prec) + b_ref[...]
            # elementwise vjp closure: exact derivative of the same
            # activation the forward kernel applies
            h, avjp = jax.vjp(_act(act), z)
            hs.append(h)
            avjps.append(avjp)

        # chunk's rows of g_out: gm_e = w_e * g_out[recv_e]
        tn = g_ref.shape[0]
        te = recv_ref.shape[1]
        cols = jax.lax.broadcasted_iota(jnp.int32, (te, tn), 1)
        onehot = jnp.where(cols == recv_ref[0], wmask_ref[0], 0.0)
        dh = jnp.dot(onehot, g_ref[...].astype(jnp.float32),
                     preferred_element_type=jnp.float32, precision=prec)

        for layer in reversed(range(n)):
            dz = avjps[layer](dh)[0]
            dw_refs[layer][...] += jax.lax.dot_general(
                hs[layer], dz, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            db_refs[layer][...] += jnp.sum(dz, axis=0, keepdims=True)
            dh = jax.lax.dot_general(
                dz, w_refs[layer][...].astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
        dfeats_ref[0] = dh

    return kernel


@functools.partial(jax.jit, static_argnames=("acts", "interpret"))
def _fused_mlp_bwd_pallas(acts, tiling: TiledCSR, feats: jax.Array,
                          ws: Tuple[jax.Array, ...],
                          bs: Tuple[jax.Array, ...], g_out: jax.Array,
                          interpret: bool = False):
    C, te = tiling.senders.shape
    fin = feats.shape[1]
    n = len(ws)
    k_out = ws[-1].shape[1]

    eidx = tiling.senders.reshape(-1)
    feats_c = jnp.take(feats, eidx, axis=0).reshape(C, te, fin)
    recv3 = tiling.recv_local.reshape(C, te, 1)
    wmask3 = tiling.wmask.reshape(C, te, 1)

    in_specs = [
        pl.BlockSpec((1, te, fin), lambda c, ct: (c, 0, 0)),
        pl.BlockSpec((1, te, 1), lambda c, ct: (c, 0, 0)),
        pl.BlockSpec((1, te, 1), lambda c, ct: (c, 0, 0)),
    ]
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, lambda c, ct: (0, 0)))
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, lambda c, ct: (0, 0)))
    in_specs.append(  # cotangent node tile for this chunk
        pl.BlockSpec((tiling.tn, k_out), lambda c, ct: (ct[c], 0)))

    out_shapes = ([jax.ShapeDtypeStruct((C, te, fin), jnp.float32)]
                  + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
                  + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs])
    # NB: bind the rank eagerly (nd=...) — a late-bound `w.shape` in the
    # index-map lambda would evaluate the LAST loop iterate at call time
    out_specs = ([pl.BlockSpec((1, te, fin), lambda c, ct: (c, 0, 0))]
                 + [pl.BlockSpec(w.shape,
                                 lambda c, ct, nd=w.ndim: (0,) * nd)
                    for w in ws]
                 + [pl.BlockSpec(b.shape,
                                 lambda c, ct, nd=b.ndim: (0,) * nd)
                    for b in bs])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        _make_bwd_kernel(acts),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(tiling.chunk_tile, feats_c, recv3, wmask3, *ws, *bs,
      g_out.astype(jnp.float32))

    dfeats_c = outs[0].reshape(-1, fin)
    dfeats = jax.ops.segment_sum(dfeats_c, eidx, num_segments=feats.shape[0])
    dws = tuple(d.astype(w.dtype) for d, w in zip(outs[1:1 + n], ws))
    dbs = tuple(d.astype(b.dtype) for d, b in zip(outs[1 + n:], bs))
    return dfeats.astype(feats.dtype), dws, dbs


def _bwd_mode() -> str:
    """Training-path backend, read at trace time. Measured on v5e at 196k
    edges / hidden 60 (BENCH r4 vmh secondaries, f32 AND bf16 policies):
    the XLA path with autodiff-SAVED activations beats both recompute
    backends — the per-edge matmuls are too narrow for the recompute's
    extra FLOPs to hide, and activation traffic fits comfortably. So:

    - ``pallas``  (default since r5) — the fully-fused pair: Pallas
      forward + Pallas backward that recomputes activations in VMEM.
      Fastest measured differentiated fused path at f32 once the XLA
      backends request HIGHEST precision (BENCH_r05: fused_grad_pbwd
      12.9M vs saved-activation 11.0M edges/s), AND no edge-wide
      activation ever exists in HBM (the saved-activation path keeps
      ~2·E·Σwidths·4B of residuals live across the fwd/bwd boundary —
      structural, by construction; the axon relay exposes no
      memory_stats and virtualizes allocations, so peak-HBM is
      UNMEASURABLE through it — both r5 attempts recorded in ROADMAP).
    - ``xla``     — saved-activation XLA forward + plain backprop.
    - ``recompute`` — XLA recompute backward (A/B baseline).

    Non-differentiated (inference / ODE forward) calls always take the
    fused Pallas kernel, which wins forward-only."""
    return os.environ.get("NGPDE_FUSED_BWD", "pallas").lower()


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_mlp_aggregate(acts: Tuple[Optional[str], ...], feats: jax.Array,
                        ws: Tuple[jax.Array, ...],
                        bs: Tuple[jax.Array, ...],
                        tiling: TiledCSR) -> jax.Array:
    """Differentiable fused ``out[i] = Σ_{e: recv_e=i} MLP(feats_e)``.

    ``acts``: static per-layer activation names; ``ws``/``bs``: per-layer
    ``(K_{l-1}, K_l)`` weights and ``(1, K_l)`` biases (pass zeros for
    bias-free layers). Returns ``(num_tiles·tn, K_out)`` — slice to
    ``num_nodes``. The primal (non-differentiated) call always runs the
    fused Pallas kernel; the training path is selected by NGPDE_FUSED_BWD
    (see ``_bwd_mode``).
    """
    return _fused_mlp_fwd(acts, tiling, feats, ws, bs)


def _edge_expand(tiling, feats, g_out):
    eidx = tiling.senders.reshape(-1)  # (S,) edge ids per chunk slot
    recv_glob = (tiling.chunk_tile[:, None] * tiling.tn
                 + tiling.recv_local).reshape(-1)
    wm = tiling.wmask.reshape(-1, 1)
    feats_s = None if feats is None else jnp.take(feats, eidx, axis=0)
    gm = (None if g_out is None
          else jnp.take(g_out, recv_glob, axis=0) * wm)
    return eidx, recv_glob, wm, feats_s, gm


def _fwd(acts, feats, ws, bs, tiling):
    if _bwd_mode() != "xla":
        return (_fused_mlp_fwd(acts, tiling, feats, ws, bs),
                (feats, ws, bs, tiling, None))
    # XLA saved-activation forward: per-layer inputs h_l and preactivations
    # z_l become residuals, exactly like autodiff through the layer path —
    # the backward then costs no recompute.
    eidx, recv_glob, wm, feats_s, _ = _edge_expand(tiling, feats, None)
    h = feats_s
    prec = _xla_dot_precision(feats.dtype)
    hs, zs = [], []
    for w, b, act in zip(ws, bs, acts):
        hs.append(h)
        z = jnp.dot(h, w, precision=prec) + b
        zs.append(z)
        h = _act(act)(z)
    out = jax.ops.segment_sum(
        h * wm, recv_glob, num_segments=tiling.num_tiles * tiling.tn)
    return (out.astype(feats.dtype),
            (feats, ws, bs, tiling, (tuple(hs), tuple(zs))))


def _bwd(acts, res, g_out):
    feats, ws, bs, tiling, saved = res
    mode = _bwd_mode()
    if saved is not None and mode == "xla":
        hs, zs = saved
        eidx, _, _, _, gm = _edge_expand(tiling, None, g_out)
        dh = gm.astype(jnp.float32)
        prec = _xla_dot_precision(feats.dtype)
        dws, dbs = [None] * len(ws), [None] * len(bs)
        for layer in reversed(range(len(ws))):
            _, act_vjp = jax.vjp(_act(acts[layer]), zs[layer])
            dz = act_vjp(dh.astype(zs[layer].dtype))[0]
            dws[layer] = jnp.einsum(
                "sf,sk->fk", hs[layer], dz, precision=prec,
                preferred_element_type=jnp.float32).astype(ws[layer].dtype)
            dbs[layer] = jnp.sum(dz, axis=0, keepdims=True,
                                 dtype=jnp.float32).astype(bs[layer].dtype)
            dh = jnp.dot(dz, ws[layer].T.astype(dz.dtype), precision=prec)
        dfeats = jax.ops.segment_sum(dh, eidx, num_segments=feats.shape[0])
        return (dfeats.astype(feats.dtype), tuple(dws), tuple(dbs),
                _zeros_like_tree(tiling))
    if mode == "recompute" or (saved is None and mode == "xla"):
        return _bwd_recompute_xla(acts, (feats, ws, bs, tiling), g_out)
    dfeats, dws, dbs = _fused_mlp_bwd_pallas(acts, tiling, feats, ws, bs,
                                             g_out)
    return (dfeats, dws, dbs, _zeros_like_tree(tiling))


def _bwd_recompute_xla(acts, res, g_out):
    """XLA recompute backward (activations recomputed per edge, then
    backprop). Kept for A/B against the other two backends."""
    feats, ws, bs, tiling = res
    eidx, _, _, feats_s, gm = _edge_expand(tiling, feats, g_out)
    prec = _xla_dot_precision(feats.dtype)

    def edge_mlp(f, ws, bs):
        h = f
        for w, b, act in zip(ws, bs, acts):
            h = _act(act)(jnp.dot(h, w, precision=prec) + b)
        return h

    _, vjp = jax.vjp(edge_mlp, feats_s, ws, bs)
    dfeats_s, dws, dbs = vjp(gm.astype(feats_s.dtype))
    dfeats = jax.ops.segment_sum(dfeats_s, eidx,
                                 num_segments=feats.shape[0])
    return (dfeats.astype(feats.dtype), dws, dbs, _zeros_like_tree(tiling))


fused_mlp_aggregate.defvjp(_fwd, _bwd)
