"""Synthetic datasets for the benchmark configs (BASELINE.json).

This container has zero network egress, so the real Cora/ogbn downloads are
replaced by structurally-matched synthetic generators (same node/edge/feature
counts, homophilous community structure so node classification is genuinely
learnable). For real mounted data use :mod:`neuralgraphpde.data.loaders`
(``load_cora`` / ``load_ogb_nodeprop``, or the ``cora_dataset(path=...)``
dispatcher).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from ..graph.gnngraph import GnnGraph


@dataclasses.dataclass
class NodeClassificationData:
    graph: GnnGraph
    features: np.ndarray  # (N, F)
    labels: np.ndarray  # (N,)
    train_mask: np.ndarray
    val_mask: np.ndarray
    test_mask: np.ndarray
    num_classes: int


def synthetic_cora(
    num_nodes: int = 2708,
    num_edges: int = 10556,
    num_features: int = 1433,
    num_classes: int = 7,
    homophily: float = 0.8,
    seed: int = 0,
) -> NodeClassificationData:
    """Citation-network stand-in matching Cora's shape (BASELINE config 1:
    2708 nodes / 10556 directed edges). Features are sparse bag-of-words-like
    rows drawn from class-specific topic distributions; edges prefer
    same-class endpoints with probability ``homophily``."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, size=num_nodes)

    # class-specific word distributions (sparse-ish)
    words_per_class = num_features // num_classes
    feats = np.zeros((num_nodes, num_features), np.float32)
    active = rng.integers(10, 40, size=num_nodes)
    for i in range(num_nodes):
        c = labels[i]
        own = rng.integers(c * words_per_class, (c + 1) * words_per_class,
                           size=active[i])
        other = rng.integers(0, num_features, size=max(active[i] // 3, 1))
        feats[i, own] = 1.0
        feats[i, other] = 1.0

    # half the edges sampled once, then mirrored (Cora is cited-both-ways in
    # the usual preprocessed form)
    m = num_edges // 2
    by_class = [np.flatnonzero(labels == c) for c in range(num_classes)]
    src = rng.integers(0, num_nodes, size=m)
    same = rng.random(m) < homophily
    dst = np.empty(m, np.int64)
    for k in range(m):
        if same[k]:
            pool = by_class[labels[src[k]]]
            dst[k] = pool[rng.integers(len(pool))]
        else:
            dst[k] = rng.integers(num_nodes)
    senders = np.concatenate([src, dst]).astype(np.int32)
    receivers = np.concatenate([dst, src]).astype(np.int32)

    g = GnnGraph.from_coo(senders, receivers, num_nodes=num_nodes)

    idx = rng.permutation(num_nodes)
    n_train, n_val = 140 * num_nodes // 2708, 500 * num_nodes // 2708
    train_mask = np.zeros(num_nodes, bool)
    val_mask = np.zeros(num_nodes, bool)
    test_mask = np.zeros(num_nodes, bool)
    train_mask[idx[:n_train]] = True
    val_mask[idx[n_train:n_train + n_val]] = True
    test_mask[idx[n_train + n_val:]] = True

    return NodeClassificationData(
        graph=g, features=feats, labels=labels.astype(np.int32),
        train_mask=train_mask, val_mask=val_mask, test_mask=test_mask,
        num_classes=num_classes,
    )


def random_spmm_graph(
    num_nodes: int,
    avg_degree: int = 16,
    feature_dim: int = 128,
    seed: int = 0,
) -> Tuple[GnnGraph, np.ndarray]:
    """Large random graph + features for SpMM/propagate benchmarks
    (edges/s/chip metric)."""
    rng = np.random.default_rng(seed)
    num_edges = num_nodes * avg_degree
    senders = rng.integers(0, num_nodes, size=num_edges, dtype=np.int64)
    receivers = np.sort(rng.integers(0, num_nodes, size=num_edges,
                                     dtype=np.int64))
    g = GnnGraph.from_coo(senders.astype(np.int32),
                          receivers.astype(np.int32), num_nodes=num_nodes)
    x = rng.normal(size=(num_nodes, feature_dim)).astype(np.float32)
    return g, x
