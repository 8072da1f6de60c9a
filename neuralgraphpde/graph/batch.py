"""Disjoint-union batching of graphs.

Equivalent of ``MLUtils.batch([g1, g2])`` consumed by the reference
(test/runtests.jl:92; batched MPPDEConv forward src/layers.jl:394-397):
node/edge indices are offset, ndata/edata are row-concatenated, gdata rows are
stacked so it becomes ``(num_graphs, F)``, and ``graph_indicator`` tracks node
ownership. The reference requires all batched graphs to share one structure
for MPPDEConv's θ broadcast (docs/src/index.md:66) — we keep that contract but
batching itself is general.
"""
from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

from .gnngraph import GnnGraph


def batch(graphs: Sequence[GnnGraph]) -> GnnGraph:
    if len(graphs) == 0:
        raise ValueError("cannot batch zero graphs")
    if len(graphs) == 1:
        g = graphs[0]
        if g.graph_indicator is None:
            g = g.replace(
                graph_indicator=jnp.zeros((g.num_nodes,), jnp.int32))
        return g
    if any(g.num_graphs != 1 for g in graphs):
        raise ValueError("batch of already-batched graphs is not supported")

    nkeys = set(graphs[0].ndata)
    ekeys = set(graphs[0].edata)
    gkeys = set(graphs[0].gdata)
    for g in graphs[1:]:
        if set(g.ndata) != nkeys or set(g.edata) != ekeys or set(g.gdata) != gkeys:
            raise ValueError("all graphs in a batch must share feature keys")

    senders, receivers, indicator = [], [], []
    offset = 0
    for i, g in enumerate(graphs):
        senders.append(g.senders + offset)
        receivers.append(g.receivers + offset)
        indicator.append(jnp.full((g.num_nodes,), i, jnp.int32))
        offset += g.num_nodes

    ndata = {k: jnp.concatenate([g.ndata[k] for g in graphs], axis=0)
             for k in sorted(nkeys)}
    edata = {k: jnp.concatenate([g.edata[k] for g in graphs], axis=0)
             for k in sorted(ekeys)}
    gdata = {k: jnp.concatenate([g.gdata[k] for g in graphs], axis=0)
             for k in sorted(gkeys)}

    return GnnGraph(
        senders=jnp.concatenate(senders),
        receivers=jnp.concatenate(receivers),
        ndata=ndata,
        edata=edata,
        gdata=gdata,
        graph_indicator=jnp.concatenate(indicator),
        num_nodes=offset,
        num_edges=sum(g.num_edges for g in graphs),
        num_graphs=len(graphs),
        receivers_sorted=False,
    )


def unbatch(g: GnnGraph) -> List[GnnGraph]:
    """Split a batched graph back into components.

    Requires a batch of identically-structured graphs (the only batched form
    the reference's layers support, docs/src/index.md:66)."""
    if g.num_graphs == 1:
        return [g]
    if g.num_nodes % g.num_graphs or g.num_edges % g.num_graphs:
        raise ValueError("unbatch requires identically-structured components")
    npg = g.num_nodes // g.num_graphs
    epg = g.num_edges // g.num_graphs
    out = []
    for i in range(g.num_graphs):
        ns = slice(i * npg, (i + 1) * npg)
        es = slice(i * epg, (i + 1) * epg)
        out.append(GnnGraph(
            senders=g.senders[es] - i * npg,
            receivers=g.receivers[es] - i * npg,
            ndata={k: v[ns] for k, v in g.ndata.items()},
            edata={k: v[es] for k, v in g.edata.items()},
            gdata={k: v[i:i + 1] for k, v in g.gdata.items()},
            graph_indicator=None,
            num_nodes=npg,
            num_edges=epg,
            num_graphs=1,
            receivers_sorted=False,
        ))
    return out
