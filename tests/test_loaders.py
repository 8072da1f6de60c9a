"""Real-data file-format loaders on tiny fixture files (VERDICT r2 #8)."""
import gzip
import os

import numpy as np

from neuralgraphpde.data import cora_dataset, load_cora, load_ogb_nodeprop


def _write_cora_fixture(root):
    # 5 papers, 4-word vocabulary, 2 classes, 3 citations
    content = [
        "p1\t1\t0\t0\t1\tAI",
        "p2\t0\t1\t0\t0\tML",
        "p3\t1\t1\t0\t0\tAI",
        "p4\t0\t0\t1\t0\tML",
        "p5\t0\t0\t1\t1\tAI",
    ]
    cites = ["p1 p2", "p3 p1", "p4 p5", "p9 p1"]  # p9 unknown -> dropped
    with open(os.path.join(root, "cora.content"), "w") as f:
        f.write("\n".join(content) + "\n")
    with open(os.path.join(root, "cora.cites"), "w") as f:
        f.write("\n".join(cites) + "\n")


def test_load_cora_fixture(tmp_path):
    _write_cora_fixture(tmp_path)
    d = load_cora(str(tmp_path), n_train_per_class=1, n_val=1, n_test=1)
    assert d.features.shape == (5, 4)
    assert d.num_classes == 2
    # 3 valid citations, mirrored
    assert d.graph.num_edges == 6
    assert d.graph.num_nodes == 5
    # labels follow sorted class names: AI=0, ML=1
    assert d.labels.tolist() == [0, 1, 0, 1, 0]
    assert d.train_mask.sum() == 2  # one per class
    assert not np.any(d.train_mask & (d.val_mask | d.test_mask))

    # dispatcher: path -> real loader; no path -> synthetic shape
    d2 = cora_dataset(str(tmp_path))
    assert d2.features.shape == (5, 4)
    d3 = cora_dataset(num_nodes=50, num_edges=100, num_features=8,
                      num_classes=3)
    assert d3.features.shape == (50, 8)


def test_load_ogb_csv_fixture(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    edges = np.asarray([[0, 1], [1, 2], [2, 0], [3, 2]])
    np.savetxt(raw / "edge.csv", edges, fmt="%d", delimiter=",")
    feats = np.arange(16, dtype=np.float32).reshape(4, 4)
    np.savetxt(raw / "node-feat.csv", feats, delimiter=",")
    # gzipped label file exercises the .gz branch
    with gzip.open(raw / "node-label.csv.gz", "wt") as f:
        f.write("0\n1\n1\n0\n")
    split = tmp_path / "split" / "sales_ranking"
    split.mkdir(parents=True)
    np.savetxt(split / "train.csv", np.asarray([0, 1]), fmt="%d")
    np.savetxt(split / "valid.csv", np.asarray([2]), fmt="%d")
    np.savetxt(split / "test.csv", np.asarray([3]), fmt="%d")

    d = load_ogb_nodeprop(str(tmp_path))
    assert d.graph.num_nodes == 4 and d.graph.num_edges == 4
    assert np.allclose(d.features, feats)
    assert d.labels.tolist() == [0, 1, 1, 0]
    assert d.train_mask.tolist() == [True, True, False, False]
    assert d.val_mask.tolist() == [False, False, True, False]
    assert d.test_mask.tolist() == [False, False, False, True]
    assert d.num_classes == 2


def test_load_ogb_npz_fast_path(tmp_path):
    np.savez(tmp_path / "graph.npz",
             senders=np.asarray([0, 1], np.int32),
             receivers=np.asarray([1, 0], np.int32),
             features=np.eye(2, dtype=np.float32),
             labels=np.asarray([0, 1]),
             train_idx=np.asarray([0]), valid_idx=np.asarray([1]),
             test_idx=np.asarray([], np.int64))
    d = load_ogb_nodeprop(str(tmp_path))
    assert d.graph.num_nodes == 2
    assert d.train_mask.tolist() == [True, False]
    assert d.val_mask.tolist() == [False, True]
