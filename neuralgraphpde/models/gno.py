"""Graph kernel network for Darcy flow (Li et al., arXiv:2003.03485).

Model around the reference's ``GNOConv`` layer (reference
src/layers.jl:424-547) for BASELINE config 4: lift the coefficient field,
apply ``depth`` kernel-integration conv layers on a radius graph (edge kernel
MLP over gathered ``(a_i, a_j, x_i, x_j)`` pairs), project to the solution.
"""
from __future__ import annotations

import dataclasses
import jax.numpy as jnp

from ..graph.gnngraph import GnnGraph
from ..nn.basic import MLP, Dense
from ..nn.conv import GNOConv
from ..nn.core import ContainerLayer
from ..utils.state import wrapgraph


@dataclasses.dataclass(frozen=True, eq=False)
class GNOModel(ContainerLayer):
    """Input: coefficient field ``a`` (N, a_dim); output: solution (N, 1).

    The graph (in state) carries ``ndata = {'a': a, 'x': pos}`` — rebind per
    sample with ``update_graph`` (the reference's GNOConv feature-location
    contract, src/layers.jl:460)."""

    a_dim: int = 1
    pos_dim: int = 2
    width: int = 64
    ker_width: int = 128
    depth: int = 4
    out_dim: int = 1
    initialgraph: callable = None

    def __post_init__(self):
        object.__setattr__(self, "initialgraph", wrapgraph(self.initialgraph))
        edge_in = 2 * (self.a_dim + self.pos_dim)
        lift = Dense(self.a_dim + self.pos_dim, self.width)
        convs = tuple(
            GNOConv(
                self.width, self.width,
                phi=MLP((edge_in, self.ker_width, self.ker_width,
                         self.width * self.width), activation="relu"),
                activation="relu" if i < self.depth - 1 else None,
                aggr="mean",
            )
            for i in range(self.depth))
        proj = Dense(self.width, self.out_dim)
        object.__setattr__(self, "lift", lift)
        object.__setattr__(self, "convs", convs)
        object.__setattr__(self, "proj", proj)
        names = ("lift",) + tuple(
            f"conv_{i + 1}" for i in range(self.depth)) + ("proj",)
        object.__setattr__(self, "layer_names", names)

    def _children(self):
        out = {"lift": self.lift, "proj": self.proj}
        for i, c in enumerate(self.convs):
            out[f"conv_{i + 1}"] = c
        return out

    def initialstates(self, rng):
        st = super().initialstates(rng)
        st["graph"] = self.initialgraph()
        return st

    def __call__(self, a, ps, st):
        g: GnnGraph = st["graph"]
        pos = g.ndata["x"]
        h, st_lift = self.lift(jnp.concatenate([a, pos], axis=-1),
                               ps["lift"], st["lift"])
        new_st = {**st, "lift": st_lift}
        g_conv = g.copy(ndata={"a": a, "x": pos})
        for i in range(self.depth):
            name = f"conv_{i + 1}"
            sub_st = {**st[name], "graph": g_conv}
            h, sub_st = self.convs[i](h, ps[name], sub_st)
            sub_st["graph"] = st[name]["graph"]
            new_st[name] = sub_st
        y, st_proj = self.proj(h, ps["proj"], st["proj"])
        new_st["proj"] = st_proj
        return y, new_st
