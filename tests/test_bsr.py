"""Block-sparse SpMM tests: parity with scatter reference, dispatch, grads."""
import jax
import jax.numpy as jnp
import numpy as np

from neuralgraphpde import grid_graph_2d, rand_graph
from neuralgraphpde.ops.bsr import bsr_spmm, build_bsr, precompute_bsr
from neuralgraphpde.ops.spmm import spmm_xla


def test_bsr_matches_reference():
    rng = np.random.default_rng(0)
    n, e = 100, 800
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    bsr = build_bsr(s, r, n, tb=16)
    got = np.asarray(bsr_spmm(bsr, jnp.asarray(x)))
    want = np.zeros((n, 16), np.float32)
    for k in range(e):
        want[r[k]] += x[s[k]]
    assert np.allclose(got, want, atol=1e-4)


def test_bsr_weighted():
    rng = np.random.default_rng(1)
    n, e = 64, 400
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, 8)).astype(np.float32)
    bsr = build_bsr(s, r, n, tb=16, edge_weight=w)
    got = np.asarray(bsr_spmm(bsr, jnp.asarray(x)))
    want = np.zeros((n, 8), np.float32)
    for k in range(e):
        want[r[k]] += w[k] * x[s[k]]
    assert np.allclose(got, want, atol=1e-4)


def test_bsr_density_gate_and_dispatch():
    from neuralgraphpde.ops import spmm

    # spatial mesh: low block density -> cached and dispatched
    g = grid_graph_2d(32, 32)
    gp = precompute_bsr(g, tb=64)
    assert "bsr" in gp.cache
    assert gp.cache["bsr"].density < 0.25
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1024, 8))
                    .astype(np.float32))
    want = np.asarray(spmm_xla(g, x))
    got = np.asarray(spmm(gp, x))
    assert np.allclose(got, want, atol=1e-4)

    # random graph: dense blocks -> gate refuses
    gr = rand_graph(256, 8000, seed=3)
    gr2 = precompute_bsr(gr, tb=32)
    assert "bsr" not in gr2.cache


def test_bsr_gradient():
    g = grid_graph_2d(8, 8)
    gp = precompute_bsr(g, tb=16, max_density=1.0)  # tiny graph: band covers most blocks
    x = jnp.asarray(np.random.default_rng(4).normal(size=(64, 4))
                    .astype(np.float32))

    def loss_bsr(x):
        return jnp.sum(bsr_spmm(gp.cache["bsr"], x) ** 2)

    def loss_ref(x):
        return jnp.sum(spmm_xla(g, x) ** 2)

    ga = jax.grad(loss_bsr)(x)
    gb = jax.grad(loss_ref)(x)
    assert np.allclose(np.asarray(ga), np.asarray(gb), atol=1e-3)
