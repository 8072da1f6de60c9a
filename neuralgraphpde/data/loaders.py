"""Real-dataset file readers (used when the data is mounted locally).

This container has no network egress, so these loaders read the standard
on-disk formats rather than downloading:

- :func:`load_cora` — the original Planetoid/LINQS raw format
  (``cora.content`` + ``cora.cites`` tab-separated files).
- :func:`load_ogb_nodeprop` — the OGB node-property raw layout
  (``raw/edge.csv[.gz]``, ``raw/node-feat.csv[.gz]``,
  ``raw/node-label.csv[.gz]``, optional ``split/*/{train,valid,test}.csv``)
  plus a fast ``.npz`` path for preprocessed dumps.
- :func:`cora_dataset` — dispatcher the examples use: real files when
  ``path`` is given, the synthetic shape-matched generator otherwise.

The tensors land in the same :class:`NodeClassificationData` container the
synthetic generators produce, so models and examples are agnostic to the
source (reference equivalent: the tutorials' dataset loading,
docs/src/tutorials/graph_node.md:25-39).
"""
from __future__ import annotations

import gzip
import os
from typing import Optional

import numpy as np

from ..graph.gnngraph import GnnGraph
from .synthetic import NodeClassificationData, synthetic_cora


def _open_maybe_gz(path: str):
    if os.path.exists(path + ".gz"):
        return gzip.open(path + ".gz", "rt")
    return open(path, "r")


def load_cora(path: str, *, seed: int = 0,
              n_train_per_class: int = 20, n_val: int = 500,
              n_test: int = 1000) -> NodeClassificationData:
    """Read the original LINQS Cora distribution.

    Expects ``<path>/cora.content`` (lines: ``<id> <w1..wF> <label>``) and
    ``<path>/cora.cites`` (lines: ``<cited> <citing>``). Edges are mirrored
    (cited-both-ways, the usual preprocessed form). The split mirrors the
    Planetoid protocol: ``n_train_per_class`` per class, then ``n_val`` /
    ``n_test`` from a seeded shuffle of the rest.
    """
    content = os.path.join(path, "cora.content")
    cites = os.path.join(path, "cora.cites")
    ids, rows, label_names = [], [], []
    with _open_maybe_gz(content) as f:
        for line in f:
            parts = line.strip().split("\t")
            if len(parts) < 3:
                continue
            ids.append(parts[0])
            rows.append(np.asarray(parts[1:-1], np.float32))
            label_names.append(parts[-1])
    feats = np.stack(rows)
    classes = sorted(set(label_names))
    labels = np.asarray([classes.index(l) for l in label_names], np.int32)
    id_of = {pid: i for i, pid in enumerate(ids)}
    n = len(ids)

    s_list, r_list = [], []
    with _open_maybe_gz(cites) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 2:
                continue
            a, b = parts
            if a in id_of and b in id_of:
                s_list.append(id_of[a])
                r_list.append(id_of[b])
    src = np.asarray(s_list, np.int32)
    dst = np.asarray(r_list, np.int32)
    senders = np.concatenate([src, dst])
    receivers = np.concatenate([dst, src])
    g = GnnGraph.from_coo(senders, receivers, num_nodes=n)

    rng = np.random.default_rng(seed)
    train_mask = np.zeros(n, bool)
    for c in range(len(classes)):
        pool = np.flatnonzero(labels == c)
        take = pool[rng.permutation(len(pool))[:n_train_per_class]]
        train_mask[take] = True
    rest = rng.permutation(np.flatnonzero(~train_mask))
    val_mask = np.zeros(n, bool)
    test_mask = np.zeros(n, bool)
    val_mask[rest[:n_val]] = True
    test_mask[rest[n_val:n_val + n_test]] = True
    return NodeClassificationData(
        graph=g, features=feats, labels=labels, train_mask=train_mask,
        val_mask=val_mask, test_mask=test_mask, num_classes=len(classes))


def load_ogb_nodeprop(path: str, *, seed: int = 0) -> NodeClassificationData:
    """Read an OGB node-property dataset from its raw directory layout.

    Fast path: ``<path>/graph.npz`` with arrays ``senders``, ``receivers``,
    ``features``, ``labels`` (+ optional ``train_idx``/``valid_idx``/
    ``test_idx``). Otherwise the OGB CSV layout: ``raw/edge.csv[.gz]``
    (``src,dst`` per line), ``raw/node-feat.csv[.gz]``,
    ``raw/node-label.csv[.gz]``, and optionally
    ``split/<name>/{train,valid,test}.csv[.gz]`` (any single subdir of
    ``split/``). Missing split files fall back to a seeded 80/10/10 split.
    """
    npz = os.path.join(path, "graph.npz")
    if os.path.exists(npz):
        z = np.load(npz)
        senders = z["senders"].astype(np.int32)
        receivers = z["receivers"].astype(np.int32)
        feats = z["features"].astype(np.float32)
        labels = z["labels"].astype(np.int32).reshape(-1)
        n = feats.shape[0]
        idx = {k: z[k] for k in ("train_idx", "valid_idx", "test_idx")
               if k in z}
    else:
        def read_csv(rel, dtype):
            with _open_maybe_gz(os.path.join(path, rel)) as f:
                return np.loadtxt(f, delimiter=",", dtype=dtype, ndmin=2)

        edges = read_csv("raw/edge.csv", np.int64)
        senders = edges[:, 0].astype(np.int32)
        receivers = edges[:, 1].astype(np.int32)
        feats = read_csv("raw/node-feat.csv", np.float32)
        labels = read_csv("raw/node-label.csv", np.int64).reshape(-1)
        labels = labels.astype(np.int32)
        n = feats.shape[0]
        idx = {}
        split_root = os.path.join(path, "split")
        if os.path.isdir(split_root):
            subs = sorted(os.listdir(split_root))
            if subs:
                sub = os.path.join(split_root, subs[0])
                for k, fn in (("train_idx", "train.csv"),
                              ("valid_idx", "valid.csv"),
                              ("test_idx", "test.csv")):
                    p = os.path.join(sub, fn)
                    if os.path.exists(p) or os.path.exists(p + ".gz"):
                        with _open_maybe_gz(p) as f:
                            idx[k] = np.loadtxt(f, dtype=np.int64).reshape(-1)

    masks = {}
    if idx:
        for k in ("train_idx", "valid_idx", "test_idx"):
            m = np.zeros(n, bool)
            if k in idx:
                m[idx[k]] = True
            masks[k] = m
    else:
        rng = np.random.default_rng(seed)
        perm = rng.permutation(n)
        n_tr, n_va = int(0.8 * n), int(0.1 * n)
        masks = {"train_idx": np.zeros(n, bool),
                 "valid_idx": np.zeros(n, bool),
                 "test_idx": np.zeros(n, bool)}
        masks["train_idx"][perm[:n_tr]] = True
        masks["valid_idx"][perm[n_tr:n_tr + n_va]] = True
        masks["test_idx"][perm[n_tr + n_va:]] = True

    g = GnnGraph.from_coo(senders, receivers, num_nodes=n)
    return NodeClassificationData(
        graph=g, features=feats, labels=labels,
        train_mask=masks["train_idx"], val_mask=masks["valid_idx"],
        test_mask=masks["test_idx"],
        num_classes=int(labels.max()) + 1 if labels.size else 0)


def cora_dataset(path: Optional[str] = None, **synthetic_kwargs
                 ) -> NodeClassificationData:
    """Real Cora when ``path`` points at the LINQS files, otherwise the
    shape-matched synthetic generator (:func:`synthetic_cora`)."""
    if path:
        return load_cora(path, seed=synthetic_kwargs.get("seed", 0))
    return synthetic_cora(**synthetic_kwargs)
