"""Abstract GNN layer types: the graph-in-state protocol.

Rebuild of reference src/layers.jl:1-34. A GNN layer owns no graph; its
``initialstates`` puts one under ``st['graph']`` (by default the empty graph,
injected later via ``update_graph``). The forward signature stays the pure
``y, st = l(x, ps, st)`` an ODE right-hand side needs.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax

from ..graph.gnngraph import GnnGraph
from .core import ContainerLayer, Layer

# Bare-array layer inputs are wrapped under this key so they can be merged
# with ndata without collisions (the reference's ``preservedname`` trick,
# src/layers.jl:94-96). The leading underscore makes it sort first, so input
# features come first in message concatenations.
INPUT_KEY = "_input"


def wrap_input(x) -> Dict[str, jax.Array]:
    if isinstance(x, dict):
        return x
    return {INPUT_KEY: x}


class AbstractGNNLayer(Layer):
    """Leaf GNN layer: ``initialstates`` returns ``{'graph': initialgraph()}``
    (reference src/layers.jl:23-24)."""

    # concrete subclasses store the wrapped thunk in ``initialgraph``
    initialgraph: Callable[[], GnnGraph]

    def initialstates(self, rng):
        return {"graph": self.initialgraph()}

    def statelength(self):
        return 1


class AbstractGNNContainerLayer(ContainerLayer):
    """Container GNN layer: children's states plus its own ``graph`` key
    (reference src/layers.jl:26-34)."""

    initialgraph: Callable[[], GnnGraph]

    def initialstates(self, rng):
        st = super().initialstates(rng)
        st["graph"] = self.initialgraph()
        return st

    def statelength(self):
        return super().statelength() + 1
