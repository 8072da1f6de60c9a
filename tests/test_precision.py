"""bf16 mixed-precision policy (nn/precision.py): wrapped layers compute in
bf16 with f32 master params/gradients, compose with the graph-in-state
machinery, and stay within bf16 tolerance of the f32 path."""
import jax
import jax.numpy as jnp
import numpy as np

from neuralgraphpde import (GCNConv, Precision, VMHConv, bf16, precompute,
                            rand_graph, setup, update_graph)
from neuralgraphpde.nn.basic import MLP


def _graph(rng, n=40, e=200):
    g = rand_graph(n, e, seed=3)
    nd = {"x": jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))}
    return precompute(g.replace(ndata=nd), dense=False)


def test_bf16_forward_close_and_f32_out():
    rng = np.random.default_rng(0)
    g = _graph(rng)
    inner = VMHConv(MLP((1 + 1 + 2, 16, 8), "tanh"), MLP((1 + 8, 16, 1)))
    model = bf16(inner)
    # single-child flattening: the wrapper's ps IS the inner layer's ps, so
    # the same master params drive both paths
    ps, st_i = setup(jax.random.PRNGKey(0), inner)
    st_i = update_graph(st_i, g)
    st = {"layer": st_i}
    x = jnp.asarray(rng.normal(size=(40, 1)).astype(np.float32))

    y, _ = model(x, ps, st)
    assert y.dtype == jnp.float32

    # params are the master copy — still f32
    for leaf in jax.tree_util.tree_leaves(ps):
        assert leaf.dtype == jnp.float32

    y32, _ = inner(x, ps, st_i)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y32), atol=3e-2,
                               rtol=3e-2)


def test_bf16_gradients_master_dtype():
    rng = np.random.default_rng(1)
    g = _graph(rng)
    model = Precision(GCNConv(4, 4, add_self_loops=False))
    ps, st = setup(jax.random.PRNGKey(1), model)
    st = update_graph(st, g)
    x = jnp.asarray(rng.normal(size=(40, 4)).astype(np.float32))

    def loss(ps):
        y, _ = model(x, ps, st)
        return jnp.sum(y ** 2)

    grads = jax.grad(loss)(ps)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(l.dtype == jnp.float32 for l in leaves)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_bf16_custom_compute_dtype_passthrough():
    """compute_dtype=f32 must be an exact no-op wrapper."""
    rng = np.random.default_rng(2)
    g = _graph(rng)
    inner = GCNConv(3, 5, add_self_loops=False)
    model = Precision(inner, compute_dtype=jnp.float32)
    ps, st_i = setup(jax.random.PRNGKey(2), inner)
    st_i = update_graph(st_i, g)
    x = jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32))
    y, _ = model(x, ps, {"layer": st_i})

    y32, _ = inner(x, ps, st_i)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y32), rtol=0,
                               atol=0)
