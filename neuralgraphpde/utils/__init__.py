from .state import drop, wrapgraph, update_graph, updategraph

__all__ = ["drop", "wrapgraph", "update_graph", "updategraph"]
