"""Per-layer activation parity vs independent NumPy transcriptions.

The reference's Julia runtime is not available here, so each layer's math is
re-implemented below directly from the reference formulas (file:line cited
per function) in plain NumPy, with the same weights injected into both
implementations. This is the per-layer allclose harness BASELINE.md requires.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralgraphpde import (
    Dense, ExplicitEdgeConv, GCNConv, GNOConv, GnnGraph, MPPDEConv, VMHConv,
    setup,
)

S = np.asarray([0, 0, 1, 2, 3, 3, 2], np.int32)
T = np.asarray([1, 2, 0, 0, 2, 1, 3], np.int32)
N = 4
RNG = np.random.default_rng(42)


def dense_np(x, W, b=None):
    y = x @ W
    return y + b if b is not None else y


def mean_agg(msgs, recv, n):
    out = np.zeros((n, msgs.shape[1]), np.float32)
    cnt = np.zeros(n, np.float32)
    for k, r in enumerate(recv):
        out[r] += msgs[k]
        cnt[r] += 1
    return out / np.maximum(cnt, 1)[:, None]


def test_gcn_parity():
    """Reference math src/layers.jl:200-239: σ(W(D^-1/2 Ã D^-1/2 x) + b)."""
    F_in, F_out = 5, 7
    x = RNG.normal(size=(N, F_in)).astype(np.float32)
    g = GnnGraph.from_coo(S, T, num_nodes=N)
    l = GCNConv(F_in, F_out, "tanh", initialgraph=g)
    ps, st = setup(jax.random.PRNGKey(0), l)
    got, _ = l(jnp.asarray(x), ps, st)

    # numpy: add self loops, symmetric normalize, aggregate, transform
    s2 = np.concatenate([S, np.arange(N)])
    t2 = np.concatenate([T, np.arange(N)])
    deg = np.bincount(t2, minlength=N).astype(np.float32)
    c = 1.0 / np.sqrt(deg)
    h = x * c[:, None]
    agg = np.zeros_like(h)
    for k in range(len(s2)):
        agg[t2[k]] += h[s2[k]]
    agg = agg * c[:, None]
    want = np.tanh(dense_np(agg, np.asarray(ps["weight"]),
                            np.asarray(ps["bias"])))
    assert np.allclose(np.asarray(got), want, atol=1e-5)


def test_explicit_edge_conv_parity():
    """Reference math src/layers.jl:103-111: mean_j ϕ([h_i; h_j; x_j−x_i])."""
    Fh, Fp, Fo = 3, 2, 6
    pos = RNG.normal(size=(N, Fp)).astype(np.float32)
    h = RNG.normal(size=(N, Fh)).astype(np.float32)
    g = GnnGraph.from_coo(S, T, num_nodes=N, ndata={"x": pos})
    phi = Dense(2 * Fh + Fp, Fo, "tanh")
    l = ExplicitEdgeConv(phi, initialgraph=g)
    ps, st = setup(jax.random.PRNGKey(1), l)
    got, _ = l(jnp.asarray(h), ps, st)

    W, b = np.asarray(ps["weight"]), np.asarray(ps["bias"])
    msgs = np.stack([
        np.tanh(dense_np(
            np.concatenate([h[T[k]], h[S[k]], pos[S[k]] - pos[T[k]]]),
            W, b[0]))
        for k in range(len(S))])
    want = mean_agg(msgs, T, N)
    assert np.allclose(np.asarray(got), want, atol=1e-5)


def test_vmh_parity():
    """Reference math src/layers.jl:313-331:
    m_i = mean_j ϕ(h_i, h_j−h_i, x_j−x_i); h_i' = γ(h_i, m_i)."""
    Fh, Fp, Fm, Fo = 3, 2, 5, 4
    pos = RNG.normal(size=(N, Fp)).astype(np.float32)
    h = RNG.normal(size=(N, Fh)).astype(np.float32)
    g = GnnGraph.from_coo(S, T, num_nodes=N, ndata={"x": pos})
    phi = Dense(2 * Fh + Fp, Fm, "tanh")
    gamma = Dense(Fh + Fm, Fo)
    l = VMHConv(phi, gamma, initialgraph=g)
    ps, st = setup(jax.random.PRNGKey(2), l)
    got, _ = l(jnp.asarray(h), ps, st)

    Wp, bp = np.asarray(ps["phi"]["weight"]), np.asarray(ps["phi"]["bias"])
    Wg, bg = np.asarray(ps["gamma"]["weight"]), np.asarray(ps["gamma"]["bias"])
    msgs = np.stack([
        np.tanh(dense_np(
            np.concatenate([h[T[k]], h[S[k]] - h[T[k]],
                            pos[S[k]] - pos[T[k]]]), Wp, bp[0]))
        for k in range(len(S))])
    m = mean_agg(msgs, T, N)
    want = dense_np(np.concatenate([h, m], axis=1), Wg, bg)
    assert np.allclose(np.asarray(got), want, atol=1e-5)


def test_mppde_parity():
    """Reference math src/layers.jl:402-421:
    m_i = mean_j ϕ(h_i, h_j, u_i−u_j, x_i−x_j, θ); h_i' = ψ(h_i, m_i, θ)."""
    Fh, Fu, Fp, Fth, Fm, Fo = 3, 2, 1, 2, 5, 4
    u = RNG.normal(size=(N, Fu)).astype(np.float32)
    pos = RNG.normal(size=(N, Fp)).astype(np.float32)
    theta = RNG.normal(size=(1, Fth)).astype(np.float32)
    h = RNG.normal(size=(N, Fh)).astype(np.float32)
    g = GnnGraph.from_coo(S, T, num_nodes=N,
                          ndata={"u": u, "x": pos}, gdata={"theta": theta})
    phi = Dense(2 * Fh + Fu + Fp + Fth, Fm, "tanh")
    psi = Dense(Fh + Fm + Fth, Fo)
    l = MPPDEConv(phi, psi, initialgraph=g)
    ps, st = setup(jax.random.PRNGKey(3), l)
    got, _ = l(jnp.asarray(h), ps, st)

    Wp, bp = np.asarray(ps["phi"]["weight"]), np.asarray(ps["phi"]["bias"])
    Ws, bs = np.asarray(ps["psi"]["weight"]), np.asarray(ps["psi"]["bias"])
    th = theta[0]
    # ndata keys iterate sorted: ('u', 'x') -> di-dj = [u_i-u_j, x_i-x_j]
    msgs = np.stack([
        np.tanh(dense_np(
            np.concatenate([h[T[k]], h[S[k]],
                            u[T[k]] - u[S[k]], pos[T[k]] - pos[S[k]], th]),
            Wp, bp[0]))
        for k in range(len(S))])
    m = mean_agg(msgs, T, N)
    want = dense_np(
        np.concatenate([h, m, np.tile(th, (N, 1))], axis=1), Ws, bs)
    assert np.allclose(np.asarray(got), want, atol=1e-5)


def test_gno_parity():
    """Reference math src/layers.jl:516-538:
    m_i = mean_j reshape(ϕ(a_i,a_j,x_i,x_j))·h_j; h' = σ(Wh + m + b)."""
    Fa, Fp, Ci, Co = 2, 2, 3, 4
    a = RNG.normal(size=(N, Fa)).astype(np.float32)
    pos = RNG.normal(size=(N, Fp)).astype(np.float32)
    h = RNG.normal(size=(N, Ci)).astype(np.float32)
    g = GnnGraph.from_coo(S, T, num_nodes=N, ndata={"a": a, "x": pos})
    phi = Dense(2 * (Fa + Fp), Ci * Co)
    l = GNOConv(Ci, Co, phi, "tanh", initialgraph=g)
    ps, st = setup(jax.random.PRNGKey(4), l)
    got, _ = l(jnp.asarray(h), ps, st)

    Wp, bp = np.asarray(ps["phi"]["weight"]), np.asarray(ps["phi"]["bias"])
    Wl, bl = (np.asarray(ps["linear"]["weight"]),
              np.asarray(ps["linear"]["bias"]))
    msgs = []
    for k in range(len(S)):
        # ndata keys sorted: ('a', 'x') -> si = [a_i, x_i]
        feats = np.concatenate([a[T[k]], pos[T[k]], a[S[k]], pos[S[k]]])
        kermat = dense_np(feats, Wp, bp[0]).reshape(Ci, Co)
        msgs.append(h[S[k]] @ kermat)
    m = mean_agg(np.stack(msgs), T, N)
    want = np.tanh(dense_np(h, Wl, bl) + m)
    assert np.allclose(np.asarray(got), want, atol=1e-5)
