"""Pallas banded-SpMM kernel tests (interpret mode on CPU): streaming
band-matmul vs XLA banded / dense reference, gradients with and without the
prebuilt reverse, bf16 bands, dispatch from ``ops.spmm``."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralgraphpde.graph.builders import grid_graph_2d
from neuralgraphpde.kernels.banded_kernels import (
    _banded_spmm_fwd, _transpose_banded, banded_spmm_pallas,
)
from neuralgraphpde.ops.bsr import banded_spmm, build_banded


def _grid_edges(nx, ny):
    g = grid_graph_2d(nx, ny)
    return np.asarray(g.senders), np.asarray(g.receivers), g.num_nodes


def _dense_ref(s, r, w, x, n):
    out = np.zeros((n, x.shape[1]), np.float32)
    for k in range(len(s)):
        out[r[k]] += w[k] * x[s[k]]
    return out


@pytest.mark.parametrize("nx,ny,tb,f", [
    (16, 16, 32, 16),
    (24, 20, 64, 128),
    (17, 13, 32, 24),   # odd nodes / odd features
])
def test_banded_kernel_matches_dense(nx, ny, tb, f):
    s, r, n = _grid_edges(nx, ny)
    rng = np.random.default_rng(0)
    w = rng.normal(size=len(s)).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    bm = build_banded(s, r, n, tb=tb, edge_weight=w)
    assert bm is not None
    got = np.asarray(_banded_spmm_fwd(bm, jnp.asarray(x), interpret=True))
    want = _dense_ref(s, r, w, x, n)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_banded_kernel_matches_xla_banded():
    s, r, n = _grid_edges(20, 20)
    x = np.random.default_rng(1).normal(size=(n, 64)).astype(np.float32)
    bm = build_banded(s, r, n, tb=64)
    got = np.asarray(_banded_spmm_fwd(bm, jnp.asarray(x), interpret=True))
    want = np.asarray(banded_spmm(bm, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_transpose_banded_is_adjoint():
    s, r, n = _grid_edges(12, 12)
    rng = np.random.default_rng(2)
    w = rng.normal(size=len(s)).astype(np.float32)
    bm = build_banded(s, r, n, tb=32, edge_weight=w)
    bmt = _transpose_banded(bm)
    # <A x, y> == <x, A^T y>
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    lhs = jnp.vdot(banded_spmm(bm, x), y)
    rhs = jnp.vdot(x, banded_spmm(bmt, y))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)
    # and it matches the banded matrix built from reversed edges
    bm_rev = build_banded(r, s, n, tb=32, edge_weight=w)
    assert bmt.offsets == bm_rev.offsets
    np.testing.assert_allclose(np.asarray(bmt.bands),
                               np.asarray(bm_rev.bands), rtol=1e-6)


@pytest.mark.parametrize("with_rev", [True, False])
def test_banded_kernel_gradient(with_rev):
    from jax.experimental.pallas import tpu as pltpu

    s, r, n = _grid_edges(10, 14)
    rng = np.random.default_rng(3)
    w = rng.normal(size=len(s)).astype(np.float32)
    bm = build_banded(s, r, n, tb=32, edge_weight=w)
    bm_rev = build_banded(r, s, n, tb=32, edge_weight=w) if with_rev else None
    x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        ga = jax.grad(
            lambda v: jnp.sum(banded_spmm_pallas(v, bm, bm_rev) ** 2))(x)
    gr = jax.grad(lambda v: jnp.sum(banded_spmm(bm, v) ** 2))(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_banded_kernel_bf16_bands():
    s, r, n = _grid_edges(16, 16)
    rng = np.random.default_rng(4)
    x = rng.normal(size=(n, 32)).astype(np.float32)
    bm16 = build_banded(s, r, n, tb=32, dtype=jnp.bfloat16)
    got = np.asarray(_banded_spmm_fwd(bm16, jnp.asarray(x), interpret=True))
    want = _dense_ref(s, r, np.ones(len(s)), x, n)
    assert got.dtype == np.float32  # f32 accumulate, input dtype out
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_spmm_dispatch_uses_banded_kernel_on_noncpu(monkeypatch):
    """`spmm()` routes banded graphs to the Pallas kernel when the backend
    is not CPU (gate: ops.spmm._pallas_available)."""
    import importlib

    spmm_mod = importlib.import_module("neuralgraphpde.ops.spmm")
    from neuralgraphpde.graph.transforms import add_self_loops
    from neuralgraphpde.ops.spmm import precompute, spmm

    g = grid_graph_2d(40, 40)
    # dia=False: on a grid the DIA stencil path outranks banded — disable it
    # so this test exercises the banded dispatch specifically
    g = precompute(add_self_loops(g), dense=False, pallas=False, bsr=True,
                   bsr_tb=64, dia=False)
    assert "banded" in g.cache and "banded_rev" in g.cache

    calls = {"n": 0}
    real = spmm_mod.__dict__  # noqa: F841

    def fake_pallas(x, bm, bm_rev=None):
        calls["n"] += 1
        return banded_spmm(bm, x)

    import neuralgraphpde.kernels.banded_kernels as bk

    monkeypatch.setattr(bk, "banded_spmm_pallas", fake_pallas)
    monkeypatch.setattr(spmm_mod, "_pallas_available", lambda: True)
    x = jnp.asarray(np.random.default_rng(5).normal(
        size=(g.num_nodes, 8)).astype(np.float32))
    y = spmm(g, x)
    assert calls["n"] == 1
    want = _dense_ref(np.asarray(g.senders), np.asarray(g.receivers),
                      np.ones(g.num_edges), np.asarray(x), g.num_nodes)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5, atol=1e-5)
