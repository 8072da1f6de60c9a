"""MP-PDE solver (Brandstetter et al., arXiv:2202.03376) with temporal
bundling.

The reference ships only the ``MPPDEConv`` layer "without the temporal
bundling trick" (reference src/layers.jl:336); the BASELINE Burgers config
requires the full solver, so the encode-process-decode architecture and
K-step bundling live here:

- encoder: per-node MLP over the bundled history ``[u_{t-K+1..t}, x, θ]``
- processor: ``depth`` residual MPPDEConv blocks
- decoder: MLP emitting K per-step increments; the next bundle is
  ``u_t + cumsum(increments)`` (autoregressive rollout repeats the whole
  model every K steps — one jitted scan).
"""
from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from ..graph.gnngraph import GnnGraph
from ..nn.basic import MLP
from ..nn.conv import MPPDEConv, _values_cat
from ..nn.core import ContainerLayer
from ..utils.state import wrapgraph


@dataclasses.dataclass(frozen=True, eq=False)
class MPPDESolver(ContainerLayer):
    """K-bundled neural PDE solver. Input/output: ``(N, K)`` solution windows.

    The graph (in state) supplies node positions ``ndata['x']`` and PDE
    parameters ``gdata`` (θ, reference src/layers.jl:359-362); the current
    window is injected into ``ndata['u']`` for the conv's ``u_i − u_j`` terms.
    """

    bundle: int = 25  # K
    hidden: int = 128
    depth: int = 6
    pos_dim: int = 1
    theta_dim: int = 0
    initialgraph: callable = None

    def __post_init__(self):
        object.__setattr__(self, "initialgraph", wrapgraph(self.initialgraph))
        K, H, P, TH = self.bundle, self.hidden, self.pos_dim, self.theta_dim
        encoder = MLP((K + P + TH, H, H), activation="swish")
        convs = tuple(
            MPPDEConv(
                phi=MLP((2 * H + K + P + TH, H, H), activation="swish"),
                psi=MLP((H + H + TH, H, H), activation="swish"),
                aggr="mean",
            )
            for _ in range(self.depth))
        decoder = MLP((H, H, K), activation="swish")
        object.__setattr__(self, "encoder", encoder)
        object.__setattr__(self, "convs", convs)
        object.__setattr__(self, "decoder", decoder)
        names = ("encoder",) + tuple(
            f"conv_{i + 1}" for i in range(self.depth)) + ("decoder",)
        object.__setattr__(self, "layer_names", names)

    def _children(self):
        out = {"encoder": self.encoder, "decoder": self.decoder}
        for i, c in enumerate(self.convs):
            out[f"conv_{i + 1}"] = c
        return out

    def initialstates(self, rng):
        st = super().initialstates(rng)
        st["graph"] = self.initialgraph()
        return st

    def __call__(self, u_window, ps, st):
        g: GnnGraph = st["graph"]
        pos = g.ndata["x"]
        theta = _values_cat(g.gdata, u_window, g.num_graphs)
        theta_n = jnp.repeat(theta, g.num_nodes // g.num_graphs, axis=0)

        h, st_enc = self.encoder(
            jnp.concatenate([u_window, pos, theta_n], axis=-1),
            ps["encoder"], st["encoder"])
        new_st = {**st, "encoder": st_enc}

        # conv layers see the current window as ndata['u']
        g_conv = g.copy(ndata={"u": u_window, "x": pos})
        for i, conv in enumerate(self.convs):
            name = f"conv_{i + 1}"
            sub_st = {**st[name], "graph": g_conv}
            dh, sub_st = conv(h, ps[name], sub_st)
            h = h + dh  # residual processor block
            # restore the layer's own (placeholder) graph so state structure
            # is stable across calls
            sub_st["graph"] = st[name]["graph"]
            new_st[name] = sub_st

        delta, st_dec = self.decoder(h, ps["decoder"], st["decoder"])
        new_st["decoder"] = st_dec
        u_next = u_window[:, -1:] + jnp.cumsum(delta, axis=-1)
        return u_next, new_st

    def rollout(self, u_window, ps, st, num_bundles: int):
        """Autoregressive K-step rollout: returns (num_bundles, N, K)."""
        def step(carry, _):
            u, st_c = carry
            u2, st_c = self(u, ps, st_c)
            return (u2, st_c), u2

        (_, st), traj = jax.lax.scan(step, (u_window, st), None,
                                     length=num_bundles)
        return traj, st
