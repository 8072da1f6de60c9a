"""Graph-in-state utilities: ``wrapgraph`` / ``update_graph`` / ``drop``.

Rebuild of reference src/utils.jl — the machinery that lets the graph live in
the Lux *state* and be swapped per batch (the package's defining pattern,
reference docs/src/index.md:9-36, SURVEY §0).
"""
from __future__ import annotations

from typing import Callable, Dict, Mapping, Optional, Union

from ..graph.gnngraph import GnnGraph, empty_graph


def drop(d: Mapping, key: str) -> Dict:
    """NamedTuple key-drop equivalent (reference src/utils.jl:1)."""
    return {k: v for k, v in d.items() if k != key}


def wrapgraph(g: Union[None, GnnGraph, Callable]) -> Callable[[], GnnGraph]:
    """Normalize an ``initialgraph`` argument into a thunk (reference
    src/utils.jl:16-17). ``None`` yields the empty-graph default
    (reference src/layers.jl:14,21)."""
    if g is None:
        return empty_graph
    if isinstance(g, GnnGraph):
        return lambda: g.copy()
    if callable(g):
        return g
    raise TypeError(f"initialgraph must be a GnnGraph or callable, got {g!r}")


def update_graph(st: Dict, g: Optional[GnnGraph] = None, **feature_overrides):
    """Recursively replace every ``GnnGraph`` leaf in a state tree.

    With ``g`` given, every graph in ``st`` is replaced by ``g`` (all layers
    share the one object — reference behavior tested at test/runtests.jl:184).
    With ``g=None``, each existing graph is constructor-copied with the given
    feature overrides (``ndata=…``/``edata=…``/``gdata=…``), reference
    src/utils.jl:24-31.
    """
    def walk(node):
        if isinstance(node, GnnGraph):
            if g is not None:
                return g
            return node.copy(**feature_overrides) if feature_overrides else node
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(st)


# Julia-API alias
updategraph = update_graph
