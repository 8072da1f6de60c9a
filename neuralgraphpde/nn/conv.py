"""The GNN layer zoo: the reference's six convolution layers, TPU-native.

Each layer reproduces the math and feature-concat ordering of its reference
counterpart in src/layers.jl (citations per class) with row-major
``(entities, features)`` tensors: all edge work is one batched MLP over the
edge dimension (MXU GEMMs of size ``num_edges × hidden``) plus a segment
reduction — the two hot loops SURVEY §3.2 identifies.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..graph.gnngraph import GnnGraph
from ..graph.builders import complete_digraph
from ..graph.transforms import add_self_loops as _add_self_loops
from ..graph.transforms import degree as _degree
from ..ops.message_passing import (apply_edges, copy_xj, e_mul_xj, propagate,
                                   w_mul_xj)
from ..ops.scatter import canonical_reduction
from ..utils.state import drop, wrapgraph
from .basic import (Dense, glorot_normal, glorot_uniform, resolve_activation,
                    zeros_init)
from .core import Layer
from .gnn import INPUT_KEY, AbstractGNNContainerLayer, AbstractGNNLayer, wrap_input

Aggr = Union[str, Callable]


def _cat(arrays, width_hint=None):
    """Feature-axis concat; ``arrays`` may be empty (yields width-0)."""
    arrays = list(arrays)
    if not arrays:
        return width_hint
    return jnp.concatenate(arrays, axis=-1)


def _phi_sub(layer, x, phi_ps, phi_st, name, n_layers):
    """Run one prefix layer of a fused ϕ with Chain-style nested params."""
    ps_i = phi_ps[name]
    st_i = phi_st.get(name, {}) if isinstance(phi_st, dict) else {}
    y, st_i = layer(x, ps_i, st_i)
    new_st = dict(phi_st) if isinstance(phi_st, dict) else {}
    new_st[name] = st_i
    return y, new_st


def _values_cat(d, like, count):
    """Concat dict values in iteration order; empty dict -> (count, 0) array
    (the reference's ``reduce(vcat, ...; init=similar(x, 0, n))`` trick,
    src/layers.jl:397,400)."""
    vals = list(d.values())
    if not vals:
        return jnp.zeros((count, 0), like.dtype)
    return jnp.concatenate(vals, axis=-1)


def _split_dense_chain(phi):
    """ϕ as a flat Dense stack: ``(layers, chain_named)`` or None.

    ``chain_named`` says whether ϕ's params are nested under
    ``layer_1..layer_N`` (Chain/MLP) or are a bare Dense's params."""
    from .basic import MLP, Chain

    if isinstance(phi, MLP):
        phi = phi._chain
    if isinstance(phi, Dense):
        return (phi,), False
    if isinstance(phi, Chain):
        layers = phi.layers
        if all(isinstance(l, Dense) for l in layers):
            return tuple(layers), True
    return None


def _node_degree(g, dtype):
    if "in_degree" in g.cache:
        return g.cache["in_degree"].astype(dtype)
    return _degree(g, dtype, direction="in")


def split_phi_last_linear(phi):
    """``(prefix_layers, last_dense)`` when ϕ is a Dense stack ending in a
    linear Dense (the GNO kernel-network shape), else None. Shared by
    ``GNOConv`` and ``parallel.layers.ShardedGNOConv``."""
    from .basic import MLP, Chain

    if isinstance(phi, MLP):
        phi = phi._chain
    if isinstance(phi, Chain):
        layers = phi.layers
    elif isinstance(phi, Dense):
        layers = (phi,)
    else:
        return None
    last = layers[-1]
    if not isinstance(last, Dense) or last.activation not in (None,
                                                              "identity"):
        return None
    return layers[:-1], last


def fused_phi_plan(phi, phi_ps, aggr):
    """Staging plan for the fused edge-MLP kernel: ``(acts, ws, bs, post)``
    when ϕ is a Dense stack with static (kernel-representable) activations
    and ``aggr`` reduces by sum/mean — else None. When ϕ ends in a linear
    Dense, that layer is split off as ``post`` and applied after the reduce
    (``Σ(h@W+b) = (Σh)@W + deg·b`` — E/N× fewer FLOPs on it). Shared by the
    single-device path (``_try_fused_phi``) and the per-partition path
    inside shard_map (``parallel.halo.sharded_propagate``)."""
    if canonical_reduction(aggr) not in ("sum", "mean"):
        return None
    split = _split_dense_chain(phi)
    if split is None:
        return None
    layers, named = split
    from ..kernels.fused_mlp_kernels import supported_activation

    if not all(supported_activation(l.activation) for l in layers):
        return None
    ps_list = ([phi_ps[f"layer_{i + 1}"] for i in range(len(layers))]
               if named else [phi_ps])

    post = None
    if len(layers) >= 2 and layers[-1].activation in (None, "identity"):
        post = ps_list[-1]
        layers, ps_list = layers[:-1], ps_list[:-1]

    acts = tuple(l.activation for l in layers)
    ws = tuple(p["weight"] for p in ps_list)
    bs = tuple(
        p["bias"] if "bias" in p else jnp.zeros((1, w.shape[1]), w.dtype)
        for p, w in zip(ps_list, ws))
    return acts, ws, bs, post


def fused_phi_post(reduced, post, deg, red):
    """Post-reduce epilogue of the fused ϕ path: mean normalization and the
    split-off linear layer, honoring the empty-receiver conventions of
    ``segment_reduce`` (empty mean rows stay 0, sum rows get ``deg·b``)."""
    if post is None:
        return (reduced / jnp.maximum(deg, 1.0)[:, None]
                if red == "mean" else reduced)
    if red == "mean":
        m = reduced / jnp.maximum(deg, 1.0)[:, None]
        m = jnp.dot(m, post["weight"], preferred_element_type=m.dtype)
        if "bias" in post:
            m = m + post["bias"]
        # empty receivers stay 0 (segment-mean convention), not the bias
        return jnp.where(deg[:, None] > 0, m, 0.0)
    m = jnp.dot(reduced, post["weight"], preferred_element_type=reduced.dtype)
    if "bias" in post:
        m = m + deg[:, None] * post["bias"]
    return m


def _try_fused_phi(phi, feats, phi_ps, g, aggr):
    """Fully-fused ``aggr_{e→i} ϕ(feats_e)`` through the Pallas edge-MLP
    kernel (kernels/fused_mlp_kernels.py). Engages when the graph carries a
    precomputed edge tiling, ϕ is a Dense stack with static activations, and
    ``aggr`` is sum/mean — else returns None and the caller takes the exact
    XLA path."""
    if "tcsr_edges" not in g.cache:
        return None
    from ..ops.spmm import _pallas_available, get_spmm_mode

    mode = get_spmm_mode()
    if not (mode == "pallas" or (mode == "auto" and _pallas_available())):
        return None
    plan = fused_phi_plan(phi, phi_ps, aggr)
    if plan is None:
        return None
    acts, ws, bs, post = plan
    from ..kernels.fused_mlp_kernels import fused_mlp_aggregate

    reduced = fused_mlp_aggregate(acts, feats, ws, bs,
                                  g.cache["tcsr_edges"])[: g.num_nodes]
    deg = _node_degree(g, reduced.dtype)
    return fused_phi_post(reduced, post, deg, canonical_reduction(aggr))


def _phi_aggregate(phi, feats, phi_ps, phi_st, g, aggr):
    """``aggr_{e→i} ϕ(feats_e)`` — fused Pallas path when available, else the
    exact ϕ-then-segment-reduce. Returns ``(m, st_phi)``."""
    m = _try_fused_phi(phi, feats, phi_ps, g, aggr)
    if m is not None:
        return m, phi_st
    from ..ops.message_passing import aggregate_neighbors

    msgs, phi_st = phi(feats, phi_ps, phi_st)
    return aggregate_neighbors(g, aggr, msgs), phi_st


# --------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True, eq=False)
class ExplicitEdgeConv(AbstractGNNContainerLayer):
    """Edge convolution ``h_i' = aggr_{j∈N(i)} ϕ([h_i; h_j; x_j − x_i])``.

    Rebuild of reference ``ExplicitEdgeConv`` (src/layers.jl:36-112): spatial
    coordinates come from ``st['graph'].ndata['x']``; any other ndata keys are
    concatenated alongside the input features; the message concat order is
    ``[h_i…, h_j…, x_j − x_i]`` (src/layers.jl:106).
    """

    phi: Layer
    initialgraph: Callable = None
    aggr: Aggr = "mean"
    layer_names: Tuple[str, ...] = ("phi",)

    def __post_init__(self):
        object.__setattr__(self, "initialgraph", wrapgraph(self.initialgraph))

    def __call__(self, x, ps, st):
        x = wrap_input(x)
        g: GnnGraph = st["graph"]
        xs = {**x, **g.ndata}  # ndata overrides on key collision (Julia merge)

        def edge_feats(xi, xj, e):
            posi, posj = xi["x"], xj["x"]
            hi, hj = drop(xi, "x"), drop(xj, "x")
            return jnp.concatenate(
                [*hi.values(), *hj.values(), posj - posi], axis=-1)

        feats = apply_edges(edge_feats, g, xi=xs, xj=xs)
        y, st_phi = _phi_aggregate(self.phi, feats, ps, st["phi"], g,
                                   self.aggr)
        return y, {**st, "phi": st_phi}


# --------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True, eq=False)
class GCNConv(AbstractGNNLayer):
    """Degree-normalized graph convolution ``σ(W(D^{-1/2} Ã D^{-1/2} x) + b)``
    with explicit params — rebuild of reference ``GCNConv``
    (src/layers.jl:114-239) including: optional bias / self-loops / stored or
    runtime edge weights, and the multiply-before-aggregate optimization when
    ``out_chs < in_chs`` (src/layers.jl:219-223).

    The aggregation is the SpMM fast path; attach acceleration structure with
    ``ops.precompute`` (dense adjacency / CSR) to the *self-looped* graph to
    keep the hot loop off the scatter path.

    Fully-fused RHS gate: on graphs carrying normalized banded/DIA structure
    (``precompute(gcn_fused=True)``), the whole RHS (normalize → aggregate →
    matmul → bias → activation) runs as ONE Pallas pass when ALL of:
    no runtime/stored edge weights, 2-D input, the activation is a
    kernel-representable STATIC name (``kernels.banded_kernels.
    epilogue_supported`` — a Python callable falls back), the Pallas backend
    is available, and the kernel-side feature width — ``out_chs`` when
    ``out_chs < in_chs`` (pre-multiply), else ``in_chs`` — is ≤ 512 (VMEM
    window budget of the stencil/banded kernels). Any unmet condition
    silently takes the numerically-identical exact path
    (tests/test_banded_rhs.py pins the F=512/513 boundary).
    """

    in_chs: int
    out_chs: int
    activation: Union[None, str, Callable] = None
    initialgraph: Callable = None
    # Reference's (Int, Int) constructor defaults to glorot_normal
    # (src/layers.jl:178); its Pair-form ctor uses glorot_uniform (:193) —
    # pass init_weight=glorot_uniform to match that variant.
    init_weight: Callable = glorot_normal
    init_bias: Callable = zeros_init
    use_bias: bool = True
    add_self_loops: bool = True
    use_edge_weight: bool = False

    def __post_init__(self):
        object.__setattr__(self, "initialgraph", wrapgraph(self.initialgraph))

    def initialparameters(self, rng):
        wk, bk = jax.random.split(rng)
        ps = {"weight": self.init_weight(wk, (self.in_chs, self.out_chs))}
        if self.use_bias:
            ps["bias"] = self.init_bias(bk, (1, self.out_chs))
        return ps

    def parameterlength(self):
        return self.out_chs * (self.in_chs + (1 if self.use_bias else 0))

    def __call__(self, x, ps, st, edge_weight: Optional[jax.Array] = None):
        g: GnnGraph = st["graph"]
        if edge_weight is not None and edge_weight.shape[0] != g.num_edges:
            # pre-self-looped graphs (precompute(add_self_loops=True)) may
            # receive weights for the original edges only
            if not (g.cache.get("self_looped", False)
                    and edge_weight.shape[0] == g.num_edges - g.num_nodes):
                raise ValueError(
                    f"wrong number of edge weights (expected {g.num_edges}, "
                    f"got {edge_weight.shape[0]})")

        if self.add_self_loops and not g.cache.get("self_looped", False):
            # A graph prepared with ``ops.precompute(g, add_self_loops=True)``
            # is already self-looped (cache flag) and keeps its fast path;
            # otherwise the graph is rebuilt here, discarding any cache.
            if any(k in g.cache for k in ("adj", "tcsr", "banded", "bsr")):
                import warnings

                warnings.warn(
                    "GCNConv(add_self_loops=True) rebuilds the graph each "
                    "forward, discarding the SpMM structure attached by "
                    "ops.precompute — aggregation falls back to the scatter "
                    "path. Precompute on the self-looped graph instead: "
                    "g = precompute(g, add_self_loops=True).", stacklevel=2)
            g = _add_self_loops(g)
            if edge_weight is not None:
                # Pad new self-loop edges with unit weight (reference
                # src/layers.jl:213-216).
                edge_weight = jnp.concatenate(
                    [edge_weight, jnp.ones((g.num_nodes,), edge_weight.dtype)])
        elif (self.add_self_loops and edge_weight is not None
              and edge_weight.shape[0] != g.num_edges):
            # pre-self-looped graph, weights given for the original edges:
            # scatter them into the (sorted) edge order recorded by
            # precompute; the loop edges keep unit weight (reference
            # src/layers.jl:213-216)
            pos = g.cache.get("orig_edge_pos")
            if pos is None:
                edge_weight = jnp.concatenate(
                    [edge_weight,
                     jnp.ones((g.num_edges - edge_weight.shape[0],),
                              edge_weight.dtype)])
            else:
                edge_weight = jnp.ones(
                    (g.num_edges,), edge_weight.dtype).at[pos].set(edge_weight)

        if (edge_weight is None and not self.use_edge_weight
                and ("banded_norm" in g.cache or "dia_norm" in g.cache
                     or "pbanded_norm" in g.cache)
                and x.ndim == 2):
            # fully-fused RHS: degree normalization lives in the stored
            # matrix values (precompute(gcn_fused=True));
            # matmul+bias+activation run in the kernel epilogue — one
            # streaming pass for the whole RHS (DIA stencil kernel on
            # structured meshes, banded-block otherwise)
            from ..kernels.banded_kernels import (banded_gcn_rhs,
                                                  epilogue_supported)
            from ..ops.spmm import _pallas_available, get_spmm_mode

            mode = get_spmm_mode()
            # width the KERNEL sees: with out<in the pre-multiplied x@w
            # (out_chs wide) streams through the kernel, so a 1024→256
            # layer still fuses; ≤512 is the VMEM x-window budget
            kernel_width = (self.out_chs if self.out_chs < self.in_chs
                            else x.shape[1])
            if (epilogue_supported(self.activation)
                    and kernel_width <= 512
                    and (mode in ("pallas", "bsr")
                         or (mode == "auto" and _pallas_available()))):
                if "dia_norm" in g.cache:
                    from ..kernels.dia_kernels import dia_gcn_rhs as rhs_fn

                    nrm = g.cache["dia_norm"]
                    nrm_rev = g.cache.get("dia_norm_rev")
                elif "pbanded_norm" in g.cache:
                    from ..kernels.banded_kernels import (
                        pbanded_gcn_rhs as rhs_fn,
                    )

                    nrm = g.cache["pbanded_norm"]
                    nrm_rev = g.cache.get("pbanded_norm_rev")
                else:
                    rhs_fn = banded_gcn_rhs
                    nrm = g.cache["banded_norm"]
                    nrm_rev = g.cache.get("banded_norm_rev")
                w = ps["weight"]
                b = ps.get("bias") if self.use_bias else None
                if self.out_chs < self.in_chs:
                    xw = jnp.dot(x, w, preferred_element_type=x.dtype)
                    y = rhs_fn(self.activation, xw, None, b, nrm, nrm_rev)
                else:
                    y = rhs_fn(self.activation, x, w, b, nrm, nrm_rev)
                return y.astype(x.dtype), st

        if self.out_chs < self.in_chs:
            x = jnp.dot(x, ps["weight"], preferred_element_type=x.dtype)

        if edge_weight is not None:
            dw = edge_weight
        elif self.use_edge_weight:
            dw = g.edata["e"].reshape(-1)
        else:
            dw = None
        if dw is None and "in_degree" in g.cache:
            # precomputed by ops.precompute — keeps the degree segment-sum
            # out of the per-stage ODE hot loop
            d = g.cache["in_degree"].astype(x.dtype)
        else:
            d = _degree(g, x.dtype, direction="in", edge_weight=dw)
        # NB: not lax.rsqrt — XLA:CPU lowers that to the approximate rsqrt
        # instruction, which breaks allclose parity.
        c = jnp.where(d > 0, 1.0 / jnp.sqrt(jnp.maximum(d, 1e-30)), 0.0)
        x = x * c[:, None]
        if edge_weight is not None:
            x = propagate(e_mul_xj, g, "sum", xj=x, e=edge_weight)
        elif self.use_edge_weight:
            x = propagate(w_mul_xj, g, "sum", xj=x)
        else:
            x = propagate(copy_xj, g, "sum", xj=x)
        x = x * c[:, None]
        if self.out_chs >= self.in_chs:
            x = jnp.dot(x, ps["weight"], preferred_element_type=x.dtype)
        if self.use_bias:
            x = x + ps["bias"]
        return resolve_activation(self.activation)(x), st


# --------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True, eq=False)
class VMHConv(AbstractGNNContainerLayer):
    """Iakovlev et al. (arXiv:2006.08956) convolution — rebuild of reference
    ``VMHConv`` (src/layers.jl:241-332):

    ``m_i = aggr_j ϕ(h_i, h_j − h_i, x_j − x_i)``; ``h_i' = γ(h_i, m_i)``.

    Unlike ExplicitEdgeConv, ϕ sees per-key *differences* ``h_j − h_i``
    (src/layers.jl:316), and γ concatenates only the original input with the
    aggregated message (src/layers.jl:328).
    """

    phi: Layer
    gamma: Layer
    initialgraph: Callable = None
    aggr: Aggr = "mean"
    layer_names: Tuple[str, ...] = ("phi", "gamma")

    def __post_init__(self):
        object.__setattr__(self, "initialgraph", wrapgraph(self.initialgraph))

    def __call__(self, x, ps, st):
        x = wrap_input(x)
        g: GnnGraph = st["graph"]
        xs = {**x, **g.ndata}

        def edge_feats(xi, xj, e):
            posi, posj = xi["x"], xj["x"]
            hi, hj = drop(xi, "x"), drop(xj, "x")
            return jnp.concatenate(
                [*hi.values(),
                 *(hj[k] - hi[k] for k in hi),
                 posj - posi], axis=-1)

        feats = apply_edges(edge_feats, g, xi=xs, xj=xs)
        m, st_phi = _phi_aggregate(self.phi, feats, ps["phi"], st["phi"], g,
                                   self.aggr)
        y, st_gamma = self.gamma(
            jnp.concatenate([*x.values(), m], axis=-1), ps["gamma"], st["gamma"])
        return y, {**st, "phi": st_phi, "gamma": st_gamma}


# --------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True, eq=False)
class MPPDEConv(AbstractGNNContainerLayer):
    """Brandstetter et al. (arXiv:2202.03376) message-passing PDE layer —
    rebuild of reference ``MPPDEConv`` (src/layers.jl:334-422), without
    temporal bundling (which lives in the MP-PDE model, not the layer):

    ``m_i = aggr_j ϕ(h_i, h_j, u_i − u_j, x_i − x_j, θ)``;
    ``h_i' = ψ(h_i, m_i, θ)``.

    PDE parameters θ live in ``g.gdata`` (concatenated with stop_gradient,
    src/layers.jl:397) and are broadcast per-edge/per-node with
    equal-blocks-per-graph semantics (``repeat inner``, src/layers.jl:410,418)
    — hence batched graphs must share one structure (docs/src/index.md:66).
    ``u``/``x`` may come from ndata (differences computed in the message) or
    pre-computed differences in edata (src/layers.jl:404-409).
    """

    phi: Layer
    psi: Layer
    initialgraph: Callable = None
    aggr: Aggr = "mean"
    layer_names: Tuple[str, ...] = ("phi", "psi")

    def __post_init__(self):
        object.__setattr__(self, "initialgraph", wrapgraph(self.initialgraph))

    def __call__(self, x, ps, st):
        g: GnnGraph = st["graph"]
        N, E, G = g.num_nodes, g.num_edges, g.num_graphs
        if N % G or E % G:
            raise ValueError(
                "MPPDEConv's θ broadcast needs identically-structured graphs "
                f"in a batch (N={N}, E={E}, num_graphs={G}); see reference "
                "docs/src/index.md:66")
        s, e = g.ndata, g.edata
        theta = jax.lax.stop_gradient(_values_cat(g.gdata, x, G))
        theta_e = jnp.repeat(theta, E // G, axis=0)  # (E, Fθ)
        theta_n = jnp.repeat(theta, N // G, axis=0)  # (N, Fθ)

        def edge_feats(xi, xj, e_feat):
            di = _values_cat({k: xi[k] for k in s}, x, E)
            dj = _values_cat({k: xj[k] for k in s}, x, E)
            e_cat = _values_cat(e_feat or {}, x, E)
            hi, hj = xi[INPUT_KEY], xj[INPUT_KEY]
            return jnp.concatenate([hi, hj, di - dj, e_cat, theta_e], axis=-1)

        xs = {INPUT_KEY: x, **s}
        feats = apply_edges(edge_feats, g, xi=xs, xj=xs, e=e)
        m, st_phi = _phi_aggregate(self.phi, feats, ps["phi"], st["phi"], g,
                                   self.aggr)
        y, st_psi = self.psi(
            jnp.concatenate([x, m, theta_n], axis=-1), ps["psi"], st["psi"])
        return y, {**st, "phi": st_phi, "psi": st_psi}


# --------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True, eq=False)
class GNOConv(AbstractGNNContainerLayer):
    """Graph kernel network layer (Li et al., arXiv:2003.03485) — rebuild of
    reference ``GNOConv`` (src/layers.jl:424-547):

    ``m_i = aggr_j ϕ(a_i, a_j, x_i, x_j) · h_j``;
    ``h_i' = σ(W h_i + m_i + b)``.

    ϕ emits a flattened ``in_chs × out_chs`` kernel matrix per edge; the
    per-edge mat-vec is one ``einsum('eio,ei->eo')`` batched contraction (the
    reference's ``NNlib.batched_mul``, src/layers.jl:529). Edge inputs to ϕ
    are the concat of gathered ndata pairs plus edata; with empty ndata the
    layer runs in pure-edata mode (reference test/runtests.jl:145-150).
    """

    in_chs: int
    out_chs: int
    phi: Layer
    activation: Union[None, str, Callable] = None
    initialgraph: Callable = None
    aggr: Aggr = "mean"
    use_bias: bool = True
    init_weight: Callable = glorot_uniform
    init_bias: Callable = zeros_init
    # Use the fused Pallas kernel (kernels/gno_kernels.py) when the graph
    # carries a precomputed edge tiling (ops.precompute(g, pallas=True)) and
    # the backend runs Pallas: ϕ's last linear layer, the per-edge matvec,
    # and the receiver segment-sum run in one kernel — the E×(in·out) kernel
    # tensor never touches HBM. Requires ϕ to be an MLP/Chain ending in a
    # plain Dense; silently falls back otherwise.
    fused: bool = True
    layer_names: Tuple[str, ...] = ("linear", "phi")

    def __post_init__(self):
        object.__setattr__(self, "initialgraph", wrapgraph(self.initialgraph))
        object.__setattr__(
            self, "linear",
            Dense(self.in_chs, self.out_chs, None, use_bias=self.use_bias,
                  init_weight=self.init_weight, init_bias=self.init_bias))

    def _children(self):
        return {"linear": self.linear, "phi": self.phi}

    def _phi_split(self):
        """(prefix_layers, last_dense) when ϕ is fusable, else None."""
        return split_phi_last_linear(self.phi)

    def _fused_forward(self, x, ps, st, g):
        from ..kernels.gno_kernels import fused_gno_aggregate, pack_last_layer
        from ..ops.message_passing import apply_edges

        split = self._phi_split()
        if split is None:
            return None
        prefix, _ = split
        E = g.num_edges
        s = g.ndata
        phi_ps = ps["phi"]
        st_cell = {"phi": st["phi"]}

        def edge_feats(xi, xj, e_feat):
            si = _values_cat({k: xi[k] for k in s}, x, E)
            sj = _values_cat({k: xj[k] for k in s}, x, E)
            e_cat = _values_cat(e_feat or {}, x, E)
            return jnp.concatenate([si, sj, e_cat], axis=-1)

        feats = apply_edges(edge_feats, g, xi=s, xj=s, e=g.edata)
        n_layers = len(prefix) + 1
        ph = feats
        for i, layer in enumerate(prefix):
            name = f"layer_{i + 1}"
            ph, st_cell["phi"] = _phi_sub(layer, ph, phi_ps, st_cell["phi"],
                                          name, n_layers)
        last_name = f"layer_{n_layers}"
        last_ps = phi_ps[last_name] if n_layers > 1 else phi_ps
        wl, bl = pack_last_layer(last_ps["weight"], last_ps.get("bias"),
                                 self.in_chs, self.out_chs)
        m = fused_gno_aggregate(ph, x, wl, bl, g.cache["tcsr_edges"],
                                g.senders)[: g.num_nodes]
        red = canonical_reduction(self.aggr)
        if red == "mean":
            if "in_degree" in g.cache:
                deg = g.cache["in_degree"].astype(m.dtype)
            else:
                deg = _degree(g, m.dtype, direction="in")
            m = m / jnp.maximum(deg, 1.0)[:, None]
        elif red != "sum":
            return None
        return m, st_cell["phi"]

    def __call__(self, x, ps, st):
        g: GnnGraph = st["graph"]
        E = g.num_edges
        s = g.ndata

        fused_out = None
        if self.fused and "tcsr_edges" in g.cache:
            from ..ops.spmm import _pallas_available, get_spmm_mode

            mode = get_spmm_mode()
            if (mode == "pallas"
                    or (mode == "auto" and _pallas_available())):
                fused_out = self._fused_forward(x, ps, st, g)
        if fused_out is not None:
            m, st_phi = fused_out
        else:
            st_cell = {"phi": st["phi"]}

            def message(xi, xj, e_feat):
                si = _values_cat({k: xi[k] for k in s}, x, E)
                sj = _values_cat({k: xj[k] for k in s}, x, E)
                e_cat = _values_cat(e_feat or {}, x, E)
                w, st_cell["phi"] = self.phi(
                    jnp.concatenate([si, sj, e_cat], axis=-1), ps["phi"],
                    st_cell["phi"])
                hj = xj["_h"]
                # Row-major layout matching the reference's column-major
                # reshape(W, out, in, E): w[e, i*out + o] == W_julia[o, i, e].
                w = w.reshape(E, self.in_chs, self.out_chs)
                return jnp.einsum("eio,ei->eo", w, hj)

            xs = {"_h": x, **s}
            m = propagate(message, g, self.aggr, xi=xs, xj=xs, e=g.edata)
            st_phi = st_cell["phi"]

        y = jnp.dot(x, ps["linear"]["weight"], preferred_element_type=x.dtype) + m
        if self.use_bias:
            y = y + ps["linear"]["bias"]
        return resolve_activation(self.activation)(y), {**st, "phi": st_phi}


# --------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True, eq=False)
class SpectralConv(AbstractGNNLayer):
    """Fourier differentiation of a 1-D periodic function cast as message
    passing on a complete digraph — rebuild of reference ``SpectralConv``
    (src/layers.jl:549-662):

    ``u_i' = 1/2 Σ_j cos((x_i − x_j) n / 2) · cot((x_i − x_j)/2) · u_j``

    ``initialstates`` builds the complete digraph with ``edata['e'] = x_t − x_s``
    (src/layers.jl:639-648); zero parameters.
    """

    n: int

    def initialstates(self, rng):
        g = complete_digraph(self.n)
        x = jnp.linspace(0.0, 2.0 * jnp.pi, self.n + 1)[1:]
        diff = x[g.receivers] - x[g.senders]
        # The message coefficient depends only on the (static) stencil, so it
        # is precomputed here and the forward rides the e_mul_xj SpMM fast
        # path — no per-solver-stage transcendentals (TPU-first deviation
        # from the reference's in-message trig, src/layers.jl:654).
        coef = (jnp.cos(diff * self.n / 2)
                * (jnp.cos(diff / 2) / jnp.sin(diff / 2)) / 2)
        g = g.replace(edata={"e": diff.reshape(-1, 1),
                             "coef": coef.reshape(-1, 1)})
        return {"graph": g}

    def initialparameters(self, rng):
        return {}

    def __call__(self, x, ps, st):
        vector_in = x.ndim == 1
        if vector_in:
            x = x.reshape(-1, 1)
        g: GnnGraph = st["graph"]
        if "coef" in g.edata:
            y = propagate(e_mul_xj, g, "sum", xj=x,
                          e=g.edata["coef"].astype(x.dtype))
        else:
            # graph swapped in via update_graph without the cached
            # coefficient: reference-faithful in-message trig
            e = g.edata["e"]

            def message(xi, xj, e_feat):
                coef = (jnp.cos(e_feat * self.n / 2)
                        * (jnp.cos(e_feat / 2) / jnp.sin(e_feat / 2)) / 2)
                return coef * xj

            y = propagate(message, g, "sum", xj=x, e=e.astype(x.dtype))
        return (y.reshape(-1) if vector_in else y), st
