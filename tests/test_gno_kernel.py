"""Fused GNO kernel tests (interpret mode): forward vs dense einsum
reference, gradients vs XLA formulation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralgraphpde.kernels.gno_kernels import (
    _fused_gno_fwd, fused_gno_aggregate, pack_last_layer,
)
from neuralgraphpde.kernels.segment_kernels import build_tiled_csr


def setup_problem(n=24, e=90, K=8, in_chs=3, out_chs=5, tn=8, te=16, seed=0):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    ph = rng.normal(size=(e, K)).astype(np.float32)
    h = rng.normal(size=(n, in_chs)).astype(np.float32)
    W = rng.normal(size=(K, in_chs * out_chs)).astype(np.float32) / np.sqrt(K)
    b = rng.normal(size=(1, in_chs * out_chs)).astype(np.float32)
    edge_t = build_tiled_csr(np.arange(e), r, n, tn=tn, te=te)
    senders = jnp.asarray(s.astype(np.int32))
    return s, r, ph, h, W, b, edge_t, senders, n, e, in_chs, out_chs


def ref_forward(s, r, ph, h, W, b, n, in_chs, out_chs):
    """Dense reference of GNOConv's message+sum (row-major reshape
    semantics: flat[i*out + o] = W[i, o])."""
    flat = ph @ W + b  # (e, in*out)
    out = np.zeros((n, out_chs), np.float32)
    for k in range(len(s)):
        Wk = flat[k].reshape(in_chs, out_chs)
        out[r[k]] += h[s[k]] @ Wk
    return out


def test_fused_forward_matches_reference():
    (s, r, ph, h, W, b, edge_t, senders, n, e,
     in_chs, out_chs) = setup_problem()
    wl, bl = pack_last_layer(jnp.asarray(W), jnp.asarray(b), in_chs, out_chs)
    got = np.asarray(_fused_gno_fwd(
        edge_t, senders, jnp.asarray(ph), jnp.asarray(h), wl, bl,
        interpret=True))[:n]
    want = ref_forward(s, r, ph, h, W, b, n, in_chs, out_chs)
    assert np.allclose(got, want, atol=1e-4)


def test_fused_forward_no_bias():
    (s, r, ph, h, W, b, edge_t, senders, n, e,
     in_chs, out_chs) = setup_problem(seed=1)
    wl, _ = pack_last_layer(jnp.asarray(W), None, in_chs, out_chs)
    got = np.asarray(_fused_gno_fwd(
        edge_t, senders, jnp.asarray(ph), jnp.asarray(h), wl, None,
        interpret=True))[:n]
    want = ref_forward(s, r, ph, h, W, np.zeros_like(b), n, in_chs, out_chs)
    assert np.allclose(got, want, atol=1e-4)


def test_fused_gradients_match_xla():
    from jax.experimental.pallas import tpu as pltpu

    (s, r, ph, h, W, b, edge_t, senders, n, e,
     in_chs, out_chs) = setup_problem(seed=2)
    ph_j, h_j = jnp.asarray(ph), jnp.asarray(h)
    W_j, b_j = jnp.asarray(W), jnp.asarray(b)
    s_j = jnp.asarray(s.astype(np.int32))
    r_j = jnp.asarray(r.astype(np.int32))

    def loss_xla(ph, h, W, b):
        flat = ph @ W + b
        Wk = flat.reshape(e, in_chs, out_chs)
        msgs = jnp.einsum("eio,ei->eo", Wk, h[s_j])
        out = jax.ops.segment_sum(msgs, r_j, num_segments=n)
        return jnp.sum(out ** 2)

    def loss_fused(ph, h, W, b):
        wl, bl = pack_last_layer(W, b, in_chs, out_chs)
        out = fused_gno_aggregate(ph, h, wl, bl, edge_t, senders)[:n]
        return jnp.sum(out ** 2)

    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(ph_j, h_j, W_j, b_j)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(
            ph_j, h_j, W_j, b_j)
    for a, bb, name in zip(g_xla, g_fused, ["ph", "h", "W", "b"]):
        assert np.allclose(np.asarray(a), np.asarray(bb), atol=1e-3), name


@pytest.mark.slow
def test_gnoconv_fused_matches_unfused():
    """GNOConv(fused=True) on a precomputed graph must agree with the
    standard path (interpret mode), fwd and grad."""
    from jax.experimental.pallas import tpu as pltpu

    from neuralgraphpde import GNOConv, MLP, precompute, rand_graph, setup

    rng = np.random.default_rng(7)
    g = rand_graph(30, 200, seed=7)
    g = g.replace(ndata={"a": rng.normal(size=(30, 2)).astype(np.float32),
                         "x": rng.normal(size=(30, 2)).astype(np.float32)})
    gp = precompute(g, dense=False, pallas=True, tn=8, te=32)
    in_chs, out_chs = 4, 6
    h = jnp.asarray(rng.normal(size=(30, in_chs)).astype(np.float32))
    phi = MLP((8, 16, in_chs * out_chs), activation="tanh")

    from neuralgraphpde.ops import set_spmm_mode

    l_std = GNOConv(in_chs, out_chs, phi, "tanh", initialgraph=gp,
                    fused=False)
    # fused=True is the DEFAULT; it engages only when the spmm mode allows
    # Pallas (auto never does on CPU), so force it for the interpret test
    l_fused = GNOConv(in_chs, out_chs, phi, "tanh", initialgraph=gp)
    ps, st = setup(jax.random.PRNGKey(5), l_std)

    want, _ = l_std(h, ps, st)
    set_spmm_mode("pallas")
    try:
        with pltpu.force_tpu_interpret_mode():
            got, _ = l_fused(h, ps, st)
    finally:
        set_spmm_mode("auto")
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    g_std = jax.grad(lambda p: jnp.sum(l_std(h, p, st)[0] ** 2))(ps)
    set_spmm_mode("pallas")
    try:
        with pltpu.force_tpu_interpret_mode():
            g_fused = jax.grad(
                lambda p: jnp.sum(l_fused(h, p, st)[0] ** 2))(ps)
    finally:
        set_spmm_mode("auto")
    for a, b in zip(jax.tree_util.tree_leaves(g_std),
                    jax.tree_util.tree_leaves(g_fused)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-3)
