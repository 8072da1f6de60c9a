"""Message-passing op tests: segment reductions, propagate, spmm paths."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralgraphpde import (
    GnnGraph, aggregate_neighbors, apply_edges, batch, copy_xj, e_mul_xj,
    precompute, propagate, reduce_nodes, segment_reduce, softmax_edge_neighbors,
    spmm, broadcast_nodes,
)
from neuralgraphpde.ops.spmm import set_spmm_mode, spmm_dense, spmm_xla

S = [0, 0, 1, 2]
T = [1, 2, 0, 0]


def tiny(**kw):
    return GnnGraph.from_coo(S, T, **kw)


def ref_aggregate(msgs, receivers, n, op):
    out = {
        "sum": np.zeros((n, msgs.shape[1])),
        "mean": np.zeros((n, msgs.shape[1])),
        "max": np.full((n, msgs.shape[1]), -np.inf),
        "min": np.full((n, msgs.shape[1]), np.inf),
        "prod": np.ones((n, msgs.shape[1])),
    }[op]
    counts = np.zeros(n)
    for e, r in enumerate(receivers):
        counts[r] += 1
        if op in ("sum", "mean"):
            out[r] += msgs[e]
        elif op == "max":
            out[r] = np.maximum(out[r], msgs[e])
        elif op == "min":
            out[r] = np.minimum(out[r], msgs[e])
        elif op == "prod":
            out[r] *= msgs[e]
    if op == "mean":
        out /= np.maximum(counts, 1)[:, None]
    if op in ("max", "min"):
        out[counts == 0] = 0  # we don't rely on empty-segment values
    return out


@pytest.mark.parametrize("op", ["sum", "mean", "max", "min", "prod"])
def test_segment_reduce_matches_dense(op):
    rng = np.random.default_rng(0)
    msgs = rng.normal(size=(4, 3)).astype(np.float32)
    got = np.asarray(segment_reduce(jnp.asarray(msgs), jnp.asarray(T, jnp.int32),
                                    3, op))
    want = ref_aggregate(msgs, T, 3, op)
    mask = np.ones_like(want, bool)
    assert np.allclose(got[mask], want[mask], atol=1e-6)


def test_propagate_copy_xj_sum():
    x = np.random.randn(3, 5).astype(np.float32)
    g = tiny()
    y = np.asarray(propagate(copy_xj, g, "sum", xj=jnp.asarray(x)))
    want = np.zeros((3, 5), np.float32)
    for s, t in zip(S, T):
        want[t] += x[s]
    assert np.allclose(y, want, atol=1e-6)


def test_propagate_custom_message_mean():
    x = np.random.randn(3, 4).astype(np.float32)

    def message(xi, xj, e):
        return xj - xi

    g = tiny()
    y = np.asarray(propagate(message, g, "mean", xi=jnp.asarray(x),
                             xj=jnp.asarray(x)))
    msgs = np.stack([x[s] - x[t] for s, t in zip(S, T)])
    want = ref_aggregate(msgs, T, 3, "mean")
    assert np.allclose(y, want, atol=1e-6)


def test_propagate_dict_features():
    xs = {"a": jnp.asarray(np.random.randn(3, 2).astype(np.float32)),
          "b": jnp.asarray(np.random.randn(3, 3).astype(np.float32))}

    def message(xi, xj, e):
        return jnp.concatenate([xi["a"], xj["b"]], axis=-1)

    y = propagate(message, tiny(), "sum", xi=xs, xj=xs)
    assert y.shape == (3, 5)


def test_e_mul_xj_weighted():
    x = np.random.randn(3, 2).astype(np.float32)
    w = np.asarray([1.0, 2.0, 3.0, 0.5], np.float32)
    y = np.asarray(propagate(e_mul_xj, tiny(), "sum", xj=jnp.asarray(x),
                             e=jnp.asarray(w)))
    want = np.zeros((3, 2), np.float32)
    for k, (s, t) in enumerate(zip(S, T)):
        want[t] += w[k] * x[s]
    assert np.allclose(y, want, atol=1e-6)


def test_spmm_paths_agree():
    g = tiny()
    x = jnp.asarray(np.random.randn(3, 8).astype(np.float32))
    base = np.asarray(spmm_xla(g, x))
    gp = precompute(g, dense=True, csr=True)
    assert np.allclose(np.asarray(spmm_dense(gp, x)), base, atol=1e-5)
    set_spmm_mode("auto")
    assert np.allclose(np.asarray(spmm(gp, x)), base, atol=1e-5)
    set_spmm_mode("xla")
    assert np.allclose(np.asarray(spmm(gp, x)), base, atol=1e-6)
    set_spmm_mode("auto")


def test_spmm_gradient():
    g = tiny()
    x = jnp.asarray(np.random.randn(3, 4).astype(np.float32))

    def loss(x):
        return jnp.sum(spmm(g, x) ** 2)

    grad = jax.grad(loss)(x)
    eps = 1e-3
    gnum = np.zeros_like(np.asarray(x))
    xn = np.asarray(x)
    for i in range(3):
        for j in range(4):
            xp, xm = xn.copy(), xn.copy()
            xp[i, j] += eps
            xm[i, j] -= eps
            gnum[i, j] = (loss(jnp.asarray(xp)) - loss(jnp.asarray(xm))) / (2 * eps)
    assert np.allclose(np.asarray(grad), gnum, atol=1e-2)


def test_graph_level_reductions():
    g1 = tiny(ndata={"u": np.ones((3, 2), np.float32)})
    gb = batch([g1, g1.copy()])
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2))
    red = np.asarray(reduce_nodes("sum", gb, x))
    assert red.shape == (2, 2)
    assert np.allclose(red[0], x[:3].sum(axis=0))
    assert np.allclose(red[1], x[3:].sum(axis=0))
    b = np.asarray(broadcast_nodes(gb, jnp.asarray(red)))
    assert b.shape == (6, 2)
    assert np.allclose(b[0], red[0]) and np.allclose(b[5], red[1])


def test_softmax_edge_neighbors():
    g = tiny()
    e = jnp.asarray(np.random.randn(4, 1).astype(np.float32))
    sm = np.asarray(softmax_edge_neighbors(g, e))
    # edges into node 0 are indices 2,3 -> softmax over those sums to 1
    assert np.isclose(sm[2] + sm[3], 1.0, atol=1e-5)
    assert np.isclose(sm[0], 1.0, atol=1e-5)  # only edge into node 1
    assert np.isclose(sm[1], 1.0, atol=1e-5)


def test_propagate_inside_jit():
    g = tiny()
    x = jnp.asarray(np.random.randn(3, 4).astype(np.float32))

    @jax.jit
    def f(g, x):
        return propagate(copy_xj, g, "sum", xj=x)

    y = f(g, x)
    assert y.shape == (3, 4)
