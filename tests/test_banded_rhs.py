"""Fused banded GCN RHS kernel (kernels.banded_gcn_rhs): degree-normalized
bands + in-kernel matmul/bias/activation epilogue vs the exact layer path
(interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from neuralgraphpde import GCNConv, add_self_loops, precompute, setup, update_graph
from neuralgraphpde.graph.builders import grid_graph_2d
from neuralgraphpde.ops.spmm import set_spmm_mode


def _graph(tb=8):
    g = add_self_loops(grid_graph_2d(8, 8, diagonals=True))
    # dia=False: this file tests the banded-block kernel specifically (the
    # grid would otherwise take the DIA stencil path, tests/test_dia.py)
    gp = precompute(g, add_self_loops=False, dense=False, pallas=False,
                    bsr=True, bsr_tb=tb, gcn_fused=True, dia=False)
    assert "banded_norm" in gp.cache, "normalized bands not built"
    return gp


def _run(layer, gp, x, mode):
    ps, st = setup(jax.random.PRNGKey(0), layer)
    st = update_graph(st, gp)

    def loss(ps, x):
        y, _ = layer(x, ps, st)
        return jnp.sum(y ** 2), y

    set_spmm_mode(mode)
    try:
        if mode == "bsr":
            with pltpu.force_tpu_interpret_mode():
                (l, y), grads = jax.value_and_grad(
                    loss, argnums=(0, 1), has_aux=True)(ps, x)
        else:
            (l, y), grads = jax.value_and_grad(
                loss, argnums=(0, 1), has_aux=True)(ps, x)
    finally:
        set_spmm_mode("auto")
    return np.asarray(y), grads


@pytest.mark.parametrize("act", [None, "tanh", "relu", "sigmoid"])
def test_fused_rhs_matches_layer_path(act):
    gp = _graph()
    layer = GCNConv(16, 16, act, add_self_loops=False)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(gp.num_nodes, 16))
                    .astype(np.float32))
    yx, gx = _run(layer, gp, x, "xla")
    yb, gb = _run(layer, gp, x, "bsr")
    np.testing.assert_allclose(yb, yx, atol=2e-4, rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(gx),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-3,
                                   rtol=2e-3)


def test_fused_rhs_out_lt_in_premultiply():
    gp = _graph()
    layer = GCNConv(16, 4, "tanh", add_self_loops=False)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(gp.num_nodes, 16))
                    .astype(np.float32))
    yx, gx = _run(layer, gp, x, "xla")
    yb, gb = _run(layer, gp, x, "bsr")
    np.testing.assert_allclose(yb, yx, atol=2e-4, rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(gx),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-3,
                                   rtol=2e-3)


def test_fused_rhs_no_bias():
    gp = _graph()
    layer = GCNConv(8, 8, "relu", use_bias=False, add_self_loops=False)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(gp.num_nodes, 8))
                    .astype(np.float32))
    yx, _ = _run(layer, gp, x, "xla")
    yb, _ = _run(layer, gp, x, "bsr")
    np.testing.assert_allclose(yb, yx, atol=2e-4, rtol=1e-3)


def _run_counting(layer, gp, x, monkeypatch):
    """Run the bsr mode while counting fused-RHS kernel engagements."""
    from neuralgraphpde.kernels import banded_kernels

    calls = []
    orig = banded_kernels.banded_gcn_rhs

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(banded_kernels, "banded_gcn_rhs", spy)
    y, _ = _run(layer, gp, x, "bsr")
    return y, len(calls)


@pytest.mark.parametrize("fin,fout,expect_fused", [
    (512, 512, True),   # at the VMEM x-window budget -> fused
    (513, 513, False),  # one past it -> silent exact path
    (513, 8, True),     # out<in pre-multiplies to 8 wide -> still fused
])
def test_fused_rhs_width_gate_boundary(fin, fout, expect_fused,
                                       monkeypatch):
    """The ≤512 kernel-width gate (GCNConv docstring) must flip exactly at
    the boundary, measured on the pre-multiplied width, and both sides must
    agree with the exact XLA path."""
    gp = _graph()
    layer = GCNConv(fin, fout, "tanh", add_self_loops=False)
    x = jnp.asarray(np.random.default_rng(4)
                    .normal(size=(gp.num_nodes, fin)).astype(np.float32))
    yx, _ = _run(layer, gp, x, "xla")
    yb, n_fused = _run_counting(layer, gp, x, monkeypatch)
    assert (n_fused > 0) == expect_fused
    np.testing.assert_allclose(yb, yx, atol=5e-4, rtol=1e-3)


def test_unsupported_activation_falls_back():
    """A callable activation can't ride the kernel epilogue — the layer must
    silently take the exact path and still agree with itself."""
    gp = _graph()
    layer = GCNConv(8, 8, jnp.tanh, add_self_loops=False)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(gp.num_nodes, 8))
                    .astype(np.float32))
    yx, _ = _run(layer, gp, x, "xla")
    yb, _ = _run(layer, gp, x, "bsr")
    np.testing.assert_allclose(yb, yx, atol=2e-4, rtol=1e-3)
