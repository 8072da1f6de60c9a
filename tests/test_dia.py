"""DIA (scalar-diagonal / stencil) SpMM: build, transpose, XLA and Pallas
paths, fused GCN RHS — vs the scatter reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from neuralgraphpde import (GCNConv, GnnGraph, add_self_loops, precompute,
                            rand_graph, setup, update_graph)
from neuralgraphpde.graph.builders import grid_graph_2d
from neuralgraphpde.kernels.dia_kernels import _dia_rhs_fwd, dia_spmm_pallas
from neuralgraphpde.ops.dia import build_dia, dia_spmm, transpose_dia
from neuralgraphpde.ops.spmm import set_spmm_mode, spmm_xla


def _grid(nx=20, ny=12):
    g = grid_graph_2d(nx, ny, diagonals=True)
    return g, np.asarray(g.senders), np.asarray(g.receivers)


def test_build_and_xla_spmm_matches_scatter():
    g, s, r = _grid()
    dm = build_dia(s, r, g.num_nodes)
    # 8-neighborhood grid without self-loops: 8 scalar offsets
    assert dm is not None and len(dm.offsets) == 8
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(g.num_nodes, 7)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(dia_spmm(dm, x)),
                               np.asarray(spmm_xla(g, x)), atol=1e-4)


def test_weighted_build():
    g, s, r = _grid()
    w = np.random.default_rng(1).random(g.num_edges).astype(np.float32)
    dm = build_dia(s, r, g.num_nodes, edge_weight=w)
    x = jnp.asarray(np.random.default_rng(1)
                    .normal(size=(g.num_nodes, 3)).astype(np.float32))
    want = spmm_xla(g, x, edge_weight=jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(dia_spmm(dm, x)),
                               np.asarray(want), atol=1e-4)


def test_transpose_matches_reverse_build():
    g, s, r = _grid()
    w = np.random.default_rng(2).random(g.num_edges).astype(np.float32)
    dm = build_dia(s, r, g.num_nodes, edge_weight=w)
    dm_rev = build_dia(r, s, g.num_nodes, edge_weight=w)
    dm_t = transpose_dia(dm)
    assert dm_t.offsets == dm_rev.offsets
    np.testing.assert_allclose(np.asarray(dm_t.values),
                               np.asarray(dm_rev.values), atol=1e-6)


def test_unstructured_graph_gates_out():
    g = rand_graph(200, 1500, seed=3)
    assert build_dia(np.asarray(g.senders), np.asarray(g.receivers),
                     g.num_nodes) is None


def test_pallas_kernel_matches_xla():
    g, s, r = _grid(40, 30)
    dm = build_dia(s, r, g.num_nodes)
    x = jnp.asarray(np.random.default_rng(4)
                    .normal(size=(g.num_nodes, 16)).astype(np.float32))
    want = np.asarray(dia_spmm(dm, x))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_dia_rhs_fwd(dm, x, None, None, act=False,
                                      interpret=True))[: g.num_nodes]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pallas_grad_matches_xla():
    g, s, r = _grid(16, 8)
    dm = build_dia(s, r, g.num_nodes)
    dm_rev = transpose_dia(dm)
    x = jnp.asarray(np.random.default_rng(5)
                    .normal(size=(g.num_nodes, 8)).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(lambda x: jnp.sum(
            dia_spmm_pallas(x, dm, dm_rev) ** 2))(x)
    gx = jax.grad(lambda x: jnp.sum(spmm_xla(g, x) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-3)


@pytest.mark.parametrize("act", ["tanh", None])
def test_gcnconv_dia_fused_matches_xla(act):
    g = add_self_loops(grid_graph_2d(16, 12, diagonals=True))
    gp = precompute(g, add_self_loops=False, dense=False, pallas=False,
                    bsr=True, gcn_fused=True)
    assert "dia_norm" in gp.cache, "normalized DIA not built"
    layer = GCNConv(12, 12, act, add_self_loops=False)
    ps, st = setup(jax.random.PRNGKey(0), layer)
    st = update_graph(st, gp)
    x = jnp.asarray(np.random.default_rng(6)
                    .normal(size=(g.num_nodes, 12)).astype(np.float32))

    def loss(ps, x):
        y, _ = layer(x, ps, st)
        return jnp.sum(y ** 2), y

    set_spmm_mode("xla")
    try:
        (lx, yx), gx = jax.value_and_grad(loss, argnums=(0, 1),
                                          has_aux=True)(ps, x)
    finally:
        set_spmm_mode("auto")
    set_spmm_mode("bsr")
    try:
        with pltpu.force_tpu_interpret_mode():
            (lb, yb), gb = jax.value_and_grad(loss, argnums=(0, 1),
                                              has_aux=True)(ps, x)
    finally:
        set_spmm_mode("auto")
    np.testing.assert_allclose(np.asarray(yb), np.asarray(yx), atol=2e-4,
                               rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(gx),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-3,
                                   rtol=2e-3)


# ---------------------------------------------------------------- hybrid DIA
def _periodic_grid(nx=40, ny=32):
    g = grid_graph_2d(nx, ny, periodic=True)
    return g, np.asarray(g.senders), np.asarray(g.receivers)


def test_hybrid_build_on_periodic_grid():
    from neuralgraphpde.ops.dia import build_dia_hybrid

    g, s, r = _periodic_grid()
    # full DIA refuses nothing here (few offsets) but the wrap offsets blow
    # the kernel bandwidth gate — the hybrid keeps the interior stencil and
    # spills the wrap edges
    hyb = build_dia_hybrid(s, r, g.num_nodes, bw_limit=64)
    assert hyb is not None
    dm, rs, rr, rw = hyb
    assert max(abs(d) for d in dm.offsets) <= 64
    # remainder = the wrap edges: 2 per boundary node per wrapped dimension
    assert 0 < len(rs) < 0.1 * g.num_edges
    # split is exact: DIA part + remainder == full scatter
    x = jnp.asarray(np.random.default_rng(2)
                    .normal(size=(g.num_nodes, 5)).astype(np.float32))
    from neuralgraphpde.ops.dia import dia_remainder_spmm

    got = dia_spmm(dm, x) + dia_remainder_spmm(
        (jnp.asarray(rs), jnp.asarray(rr), jnp.asarray(rw)), x, g.num_nodes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(spmm_xla(g, x)),
                               atol=1e-4)


def test_hybrid_rejects_unstructured():
    from neuralgraphpde.ops.dia import build_dia_hybrid

    rng = np.random.default_rng(3)
    n, e = 4096, 40960
    s = rng.integers(0, n, e).astype(np.int64)
    r = rng.integers(0, n, e).astype(np.int64)
    assert build_dia_hybrid(s, r, n) is None


def test_hybrid_precompute_dispatch_and_grad():
    """precompute on a periodic grid engages the hybrid (dia + dia_rem) and
    spmm matches XLA forward + gradient (interpret-mode kernel)."""
    from neuralgraphpde.ops.spmm import precompute as _pre
    from neuralgraphpde.ops.spmm import spmm

    g, s, r = _periodic_grid(64, 48)
    gp = _pre(g, dense=False, pallas=False, bsr=True)
    assert "dia" in gp.cache and "dia_rem" in gp.cache

    x = jnp.asarray(np.random.default_rng(4)
                    .normal(size=(g.num_nodes, 6)).astype(np.float32))

    def f(x, graph):
        return jnp.sum(spmm(graph, x) ** 2)

    lx, gx = jax.value_and_grad(f)(x, g)  # no cache: XLA scatter
    with pltpu.force_tpu_interpret_mode():
        lp, gp_ = jax.value_and_grad(f)(x, gp)
    np.testing.assert_allclose(float(lp), float(lx), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gp_), np.asarray(gx), atol=2e-3,
                               rtol=2e-3)


def test_halo_block_window_multi_tile():
    """The halo-block window scheme (hb < tn) must agree with the XLA
    stencil across several row tiles, including the clamped boundary tiles
    — a mesh tall enough that padded_nodes spans multiple hb-blocks."""
    # 16384 nodes -> n_pad 16384; bandwidth ~130 -> hb=512, tn=4096 ->
    # 4 row tiles with thin halo blocks, first/last tiles clamped
    g, s, r = _grid(128, 128)
    dm = build_dia(s, r, g.num_nodes)
    from neuralgraphpde.kernels.dia_kernels import _pick_tiles
    tn, hb = _pick_tiles(dm.bandwidth, dm.padded_nodes, 8, 8, 4, 4,
                         len(dm.offsets))
    assert hb < tn and dm.padded_nodes // tn >= 2, (tn, hb)
    x = jnp.asarray(np.random.default_rng(9)
                    .normal(size=(g.num_nodes, 8)).astype(np.float32))
    want = np.asarray(dia_spmm(dm, x))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_dia_rhs_fwd(dm, x, None, None, act=False,
                                      interpret=True))[: g.num_nodes]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_bf16_input_gives_bf16_output():
    """bf16-policy contract: dia_gcn_rhs with bf16 x writes bf16 out (half
    the output traffic), numerically close to the f32-out path."""
    from neuralgraphpde.kernels.dia_kernels import dia_gcn_rhs

    g, s, r = _grid(16, 16)
    deg = np.bincount(r, minlength=g.num_nodes).astype(np.float64)
    c = 1.0 / np.sqrt(np.maximum(deg, 1.0))
    dm = build_dia(s, r, g.num_nodes, edge_weight=(c[r] * c[s]).astype(np.float32),
                   dtype=jnp.bfloat16)
    dm_rev = transpose_dia(dm)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(g.num_nodes, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32) / 3)
    with pltpu.force_tpu_interpret_mode():
        y32 = dia_gcn_rhs("tanh", x, w, None, dm, dm_rev)
        y16 = dia_gcn_rhs("tanh", x.astype(jnp.bfloat16), w, None, dm,
                          dm_rev)
    assert y32.dtype == jnp.float32
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y16, np.float32),
                               np.asarray(y32), atol=2e-2)


def test_rejected_config_falls_back_to_exact_xla():
    """Configs outside the kernel's VMEM model (huge bandwidth) must take
    the exact XLA stencil path — same values, no ValueError (r5 ADVICE:
    _pick_tiles rejections used to crash GCNConv/spmm forwards)."""
    from neuralgraphpde.kernels.dia_kernels import (_dia_rhs_fwd,
                                                    dia_config_supported)
    from neuralgraphpde.ops.dia import DiaMatrix

    rng = np.random.default_rng(3)
    n = 4096
    n_pad = n
    vals = rng.normal(size=(n_pad, 3)).astype(np.float32)
    dm = DiaMatrix(values=jnp.asarray(vals), offsets=(-6000, 0, 6000),
                   num_nodes=n)
    assert not dia_config_supported(dm.bandwidth, dm.padded_nodes, 512, 64,
                                    4, 4, 3, True)
    x = jnp.asarray(rng.normal(size=(n, 512)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(512, 64)) / 23).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1, 64)).astype(np.float32))
    got = _dia_rhs_fwd(dm, x, w, b, act="tanh")
    want = jnp.tanh(
        jnp.dot(dia_spmm(dm, x), w,
                precision=jax.lax.Precision.HIGHEST) + b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    got_p = _dia_rhs_fwd(dm, x, None, None, act=False)
    np.testing.assert_allclose(np.asarray(got_p),
                               np.asarray(dia_spmm(dm, x)), atol=1e-5)


@pytest.mark.parametrize("variant", ["concat32", "phase", "store",
                                     "phase_store"])
def test_stencil_body_variants_match(variant, monkeypatch):
    """All stencil-body strategies (NGPDE_DIA_VARIANT — the r5 A/B lever:
    phase-grouped sublane-aligned slices, storage-dtype window) must agree
    with the XLA stencil for f32 and bf16 storage."""
    monkeypatch.setenv("NGPDE_DIA_VARIANT", variant)
    jax.clear_caches()
    g, s, r = _grid(32, 32)
    rng = np.random.default_rng(0)
    for dt, tol in ((np.float32, 1e-5), (jnp.bfloat16, 2e-2)):
        dm = build_dia(s, r, g.num_nodes, dtype=dt)
        x = jnp.asarray(rng.normal(size=(g.num_nodes, 32))
                        .astype(np.float32)).astype(dt)
        want = np.asarray(dia_spmm(dm, x), np.float32)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(_dia_rhs_fwd(dm, x, None, None, act=False,
                                          interpret=True),
                             np.float32)[: g.num_nodes]
        denom = max(float(np.max(np.abs(want))), 1e-9)
        assert np.max(np.abs(got - want)) / denom < tol, (variant, dt)
    jax.clear_caches()
