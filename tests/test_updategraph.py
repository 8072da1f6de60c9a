"""update_graph utility semantics — mirrors reference test/runtests.jl:166-205."""
import jax
import numpy as np

from neuralgraphpde import (
    Chain, GCNConv, rand_graph, setup, update_graph, wrapgraph, drop,
)

RNG = jax.random.PRNGKey(0)


def test_replace_graph_single_layer():
    g = rand_graph(5, 4, seed=0)
    l = GCNConv(3, 5, initialgraph=g)
    ps, st = setup(RNG, l)
    new_g = rand_graph(5, 7, seed=1)
    new_st = update_graph(st, new_g)
    assert new_st["graph"] is new_g


def test_replace_graph_in_chain():
    g = rand_graph(5, 4, seed=0)
    model = Chain((GCNConv(3, 5, initialgraph=g),
                   GCNConv(5, 5, initialgraph=g)))
    ps, st = setup(RNG, model)
    new_g = rand_graph(5, 7, seed=1)
    new_st = update_graph(st, new_g)
    # all layers share the one graph object (reference test/runtests.jl:184)
    assert new_st["layer_1"]["graph"] is new_st["layer_2"]["graph"] is new_g


def test_kwargs_only_feature_update():
    g = rand_graph(5, 4, seed=0)
    l = GCNConv(3, 5, initialgraph=g)
    ps, st = setup(RNG, l)
    ndata = np.random.rand(5, 3).astype(np.float32)
    new_st = update_graph(st, ndata=ndata)
    assert new_st["graph"].ndata["x"] is ndata  # identity preserved
    # structure untouched
    assert new_st["graph"].num_edges == 4


def test_kwargs_update_in_chain():
    g = rand_graph(5, 4, seed=0)
    model = Chain((GCNConv(3, 5, initialgraph=g),
                   GCNConv(5, 5, initialgraph=g)))
    ps, st = setup(RNG, model)
    ndata = np.random.rand(5, 3).astype(np.float32)
    new_st = update_graph(st, ndata=ndata)
    assert (new_st["layer_1"]["graph"].ndata["x"] is
            new_st["layer_2"]["graph"].ndata["x"] is ndata)


def test_wrapgraph_and_drop():
    g = rand_graph(4, 3, seed=0)
    thunk = wrapgraph(g)
    assert thunk() == g
    f = wrapgraph(lambda: g)
    assert f() is g
    d = {"a": 1, "x": 2}
    assert drop(d, "x") == {"a": 1}


def test_empty_graph_then_inject():
    """Models can be initialized graph-free and have the graph injected later
    (reference docs/src/index.md:38-54)."""
    import jax.numpy as jnp

    l = GCNConv(3, 5)  # no initialgraph -> EMPTYGRAPH default
    ps, st = setup(RNG, l)
    assert st["graph"].num_nodes == 0
    g = rand_graph(6, 10, seed=2)
    st = update_graph(st, g)
    y, _ = l(jnp.ones((6, 3)), ps, st)
    assert y.shape == (6, 5)
