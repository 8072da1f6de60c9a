"""Graph container / transform tests (reference test/runtests.jl fixture:
s=[1,1,2,3], t=[2,3,1,1] — 3 nodes, 4 edges; 0-based here)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralgraphpde import (
    GnnGraph, add_self_loops, batch, complete_digraph, csr_offsets, degree,
    empty_graph, grid_graph_1d, grid_graph_2d, rand_graph, sort_by_receiver,
    to_dense_adjacency, unbatch,
)

S = [0, 0, 1, 2]
T = [1, 2, 0, 0]


def tiny():
    return GnnGraph.from_coo(S, T)


def test_from_coo_counts():
    g = tiny()
    assert g.num_nodes == 3
    assert g.num_edges == 4
    assert g.num_graphs == 1


def test_feature_normalization():
    g = GnnGraph.from_coo(S, T, ndata=np.random.randn(3, 5))
    assert set(g.ndata) == {"x"}
    assert g.ndata["x"].shape == (3, 5)
    g = GnnGraph.from_coo(S, T, edata=np.random.randn(4, 2))
    assert g.edata["e"].shape == (4, 2)
    # gdata vector for a single graph becomes one feature row
    g = GnnGraph.from_coo(S, T, gdata={"theta": np.random.randn(4)})
    assert g.gdata["theta"].shape == (1, 4)


def test_feature_shape_validation():
    with pytest.raises(ValueError):
        GnnGraph.from_coo(S, T, ndata=np.random.randn(5, 3))


def test_replace_preserves_structure():
    g = tiny()
    x = np.random.randn(3, 7)
    g2 = g.replace(ndata={"x": x})
    assert g2.num_edges == 4
    assert np.array_equal(np.asarray(g2.senders), np.asarray(g.senders))
    assert g2.ndata["x"] is x  # identity preserved for exact-layout arrays


def test_equality():
    assert tiny() == tiny()
    assert tiny() != rand_graph(3, 4, seed=0)
    g = tiny()
    assert g.copy() == g


def test_pytree_roundtrip():
    g = GnnGraph.from_coo(S, T, ndata={"x": np.random.randn(3, 2)})
    leaves, treedef = jax.tree_util.tree_flatten(g)
    g2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert g2 == g
    assert g2.num_nodes == 3

    @jax.jit
    def through(graph):
        return graph

    g3 = through(g)
    assert g3.num_nodes == 3
    assert np.allclose(np.asarray(g3.ndata["x"]), np.asarray(g.ndata["x"]))


def test_add_self_loops():
    g = add_self_loops(tiny())
    assert g.num_edges == 7
    s, t = np.asarray(g.senders), np.asarray(g.receivers)
    assert list(s[-3:]) == [0, 1, 2]
    assert list(t[-3:]) == [0, 1, 2]


def test_degree():
    g = tiny()
    d_in = np.asarray(degree(g))
    assert list(d_in) == [2, 1, 1]
    d_out = np.asarray(degree(g, direction="out"))
    assert list(d_out) == [2, 1, 1]
    w = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    dw = np.asarray(degree(g, edge_weight=w))
    assert np.allclose(dw, [7.0, 1.0, 2.0])


def test_sort_and_csr():
    g = sort_by_receiver(tiny())
    r = np.asarray(g.receivers)
    assert all(r[1:] >= r[:-1])
    off = np.asarray(csr_offsets(g))
    assert list(off) == [0, 2, 3, 4]


def test_dense_adjacency():
    g = tiny()
    a = np.asarray(to_dense_adjacency(g))
    expected = np.zeros((3, 3))
    for s, t in zip(S, T):
        expected[t, s] += 1
    assert np.allclose(a, expected)


def test_complete_digraph():
    g = complete_digraph(4)
    assert g.num_edges == 12
    s, t = np.asarray(g.senders), np.asarray(g.receivers)
    assert not np.any(s == t)


def test_rand_graph_bidirected():
    g = rand_graph(10, 20, bidirected=True, seed=1)
    assert g.num_edges == 20
    pairs = set(zip(np.asarray(g.senders).tolist(),
                    np.asarray(g.receivers).tolist()))
    for s, t in list(pairs):
        assert (t, s) in pairs


def test_grid_graphs():
    g = grid_graph_1d(5, stencil=1)
    assert g.num_edges == 8
    g = grid_graph_1d(5, periodic=True, stencil=2)
    assert g.num_edges == 20
    g = grid_graph_2d(3, 3)
    assert g.num_nodes == 9
    assert g.num_edges == 24


def test_batch_unbatch():
    g = GnnGraph.from_coo(
        S, T,
        ndata={"u": np.random.randn(3, 2)},
        gdata={"theta": np.random.randn(4)},
    )
    gb = batch([g, g.copy()])
    assert gb.num_nodes == 6
    assert gb.num_edges == 8
    assert gb.num_graphs == 2
    assert gb.gdata["theta"].shape == (2, 4)
    assert gb.ndata["u"].shape == (6, 2)
    assert list(np.asarray(gb.graph_indicator)) == [0, 0, 0, 1, 1, 1]
    # second copy's indices offset by 3
    assert list(np.asarray(gb.senders)[4:]) == [s + 3 for s in S]

    parts = unbatch(gb)
    assert len(parts) == 2
    assert parts[0] == parts[1]
    assert np.allclose(np.asarray(parts[0].ndata["u"]),
                       np.asarray(g.ndata["u"]))


def test_empty_graph():
    g = empty_graph()
    assert g.num_nodes == 0 and g.num_edges == 0


def test_pad_graph_preserves_aggregation():
    from neuralgraphpde import GCNConv, pad_graph, setup, spmm, update_graph

    g = GnnGraph.from_coo(S, T, ndata={"x": np.random.randn(3, 2).astype(np.float32)})
    gp = pad_graph(g, 8, 16)
    assert gp.num_nodes == 8 and gp.num_edges == 16
    x = np.random.randn(3, 4).astype(np.float32)
    xp = np.concatenate([x, np.zeros((5, 4), np.float32)])
    want = np.asarray(spmm(g, jnp.asarray(x)))
    got = np.asarray(spmm(gp, jnp.asarray(xp)))
    assert np.allclose(got[:3], want, atol=1e-6)
    # padded buckets share one compiled step across different true sizes
    l = GCNConv(4, 4)
    ps, st = setup(jax.random.PRNGKey(0), l)
    traces = []

    @jax.jit
    def fwd(x, st):
        traces.append(1)
        y, _ = l(x, ps, st)
        return y

    for seed in (0, 1):
        g2 = rand_graph(5 + seed, 6 + seed, seed=seed)
        g2p = pad_graph(g2, 8, 16)
        fwd(jnp.asarray(np.random.randn(8, 4).astype(np.float32)),
            update_graph(st, g2p))
    assert len(traces) == 1  # no retrace across bucket members


def test_pad_graph_validation():
    import pytest as _pytest
    g = tiny()
    with _pytest.raises(ValueError):
        pad_graph_mod = __import__("neuralgraphpde").pad_graph
        pad_graph_mod(g, 2, 10)


def test_feature_key_insertion_order_preserved():
    """The reference concatenates NamedTuple values in user declaration order
    (reference src/layers.jl:106,316); insertion order must survive both
    construction and jit pytree round-trips (plain dicts would be re-sorted).
    """
    z = np.random.rand(3, 2).astype(np.float32)
    a = np.random.rand(3, 4).astype(np.float32)
    g = GnnGraph.from_coo([0, 1], [1, 2], num_nodes=3,
                          ndata={"z": z, "a": a})
    assert list(g.ndata) == ["z", "a"]

    # survives a jit boundary (tree_flatten keeps key order in aux data)
    @jax.jit
    def roundtrip(g):
        assert list(g.ndata) == ["z", "a"]
        return jnp.concatenate(list(g.ndata.values()), axis=-1)

    got = np.asarray(roundtrip(g))
    assert np.allclose(got, np.concatenate([z, a], axis=-1), atol=0)

    # replace() keeps the override's declared order too
    g2 = g.replace(ndata={"b": a, "c": z})
    assert list(g2.ndata) == ["b", "c"]


def test_from_dense_adjmat_roundtrip():
    """ADJMAT ingestion (reference GNNGraphs ADJMAT storage): from_dense ->
    COO -> to_dense_adjacency round-trips, weights land in edata['e'] and
    GCNConv(use_edge_weight=True) consumes them."""
    import numpy as np
    from neuralgraphpde import GCNConv, GnnGraph, setup, update_graph
    from neuralgraphpde.graph.transforms import to_dense_adjacency

    rng = np.random.default_rng(0)
    A = (rng.random((12, 12)) < 0.3).astype(np.float32)
    A *= rng.uniform(0.5, 2.0, A.shape).astype(np.float32)
    g = GnnGraph.from_dense(A)
    assert g.num_nodes == 12 and g.num_edges == int((A != 0).sum())
    assert g.receivers_sorted
    np.testing.assert_allclose(
        np.asarray(to_dense_adjacency(g, edge_weight=g.edata["e"]
                                      .reshape(-1))), A, atol=1e-6)

    # unweighted matrix: connectivity only unless forced
    B = (A != 0).astype(np.float32)
    gb = GnnGraph.from_dense(B)
    assert "e" not in gb.edata
    gb2 = GnnGraph.from_dense(B, store_weights=True)
    assert np.allclose(np.asarray(gb2.edata["e"]), 1.0)

    # stored weights flow through GCNConv(use_edge_weight=True)
    import jax
    import jax.numpy as jnp
    layer = GCNConv(4, 4, use_edge_weight=True, add_self_loops=False)
    ps, st = setup(jax.random.PRNGKey(0), layer)
    st = update_graph(st, g)
    x = jnp.asarray(rng.normal(size=(12, 4)).astype(np.float32))
    y, _ = layer(x, ps, st)
    y2, _ = layer(x, ps, st, edge_weight=g.edata["e"].reshape(-1))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)
