"""Layer zoo tests — mirrors the reference test matrix (test/runtests.jl:8-163):
shape contracts, state purity, feature-location variants, batched graphs, and
SpectralConv numerical correctness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralgraphpde import (
    Dense, ExplicitEdgeConv, GCNConv, GNOConv, GnnGraph, MPPDEConv,
    SpectralConv, VMHConv, batch, rand_graph, setup, update_graph,
)

S = [0, 0, 1, 2]
T = [1, 2, 0, 0]


def tiny(**kw):
    return GnnGraph.from_coo(S, T, **kw)


RNG = jax.random.PRNGKey(0)


class TestGCNConv:
    def test_shape_and_state_purity(self):
        # reference test/runtests.jl:16-25
        g = tiny()
        x = jnp.asarray(np.random.randn(3, 3).astype(np.float32))
        l = GCNConv(3, 5, initialgraph=g)
        ps, st = setup(RNG, l)
        assert st["graph"] == g
        y, st2 = l(x, ps, st)
        assert y.shape == (3, 5)
        assert st2["graph"] == g

    def test_parameterlength(self):
        l = GCNConv(3, 5)
        assert l.parameterlength() == 5 * 4
        l = GCNConv(3, 5, use_bias=False)
        assert l.parameterlength() == 15

    def test_manual_value(self):
        # 2-node graph with one edge 0->1 plus self-loops; identity weight.
        g = GnnGraph.from_coo([0], [1], num_nodes=2)
        l = GCNConv(2, 2, initialgraph=g, use_bias=False)
        ps = {"weight": jnp.eye(2)}
        st = {"graph": g}
        x = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
        y, _ = l(x, ps, st)
        # after self loops: deg_in = [1, 2]; c = [1, 1/sqrt(2)]
        # y0 = c0 * (c0 x0) = x0 ;  y1 = c1 * (c0 x0 + c1 x1) = x0/sqrt2 + x1/2
        want0 = np.asarray([1.0, 2.0])
        want1 = np.asarray([1.0, 2.0]) / np.sqrt(2) + np.asarray([3.0, 4.0]) / 2
        assert np.allclose(np.asarray(y[0]), want0, atol=1e-6)
        assert np.allclose(np.asarray(y[1]), want1, atol=1e-6)

    def test_no_self_loops(self):
        g = tiny()
        l = GCNConv(3, 5, initialgraph=g, add_self_loops=False)
        ps, st = setup(RNG, l)
        y, _ = l(jnp.ones((3, 3)), ps, st)
        assert y.shape == (3, 5)

    def test_runtime_edge_weight(self):
        g = tiny()
        l = GCNConv(3, 5, initialgraph=g)
        ps, st = setup(RNG, l)
        w = jnp.asarray([1.0, 0.5, 2.0, 1.0])
        y, _ = l(jnp.ones((3, 3)), ps, st, edge_weight=w)
        assert y.shape == (3, 5)

    def test_stored_edge_weight(self):
        g = tiny(edata={"e": np.asarray([1.0, 0.5, 2.0, 1.0], np.float32)})
        l = GCNConv(3, 5, initialgraph=g, use_edge_weight=True,
                    add_self_loops=False)
        ps, st = setup(RNG, l)
        y, _ = l(jnp.ones((3, 3)), ps, st)
        assert y.shape == (3, 5)

    def test_out_lt_in_premultiply_equivalent(self):
        g = tiny()
        x = jnp.asarray(np.random.randn(3, 6).astype(np.float32))
        l_small = GCNConv(6, 2, initialgraph=g, use_bias=False)
        ps, st = setup(RNG, l_small)
        y_small, _ = l_small(x, ps, st)
        # Manually compute post-multiply order; must agree (linearity).
        l_id = GCNConv(6, 6, initialgraph=g, use_bias=False)
        ps_id = {"weight": jnp.eye(6)}
        agg, _ = l_id(x, ps_id, st)
        y_post = jnp.dot(agg, ps["weight"])
        assert np.allclose(np.asarray(y_small), np.asarray(y_post), atol=1e-5)


class TestExplicitEdgeConv:
    def test_shape_and_state(self):
        # reference test/runtests.jl:27-37
        gh = tiny(ndata={"x": np.random.rand(3, 3).astype(np.float32)})
        u = jnp.asarray(np.random.randn(3, 4).astype(np.float32))
        nn = Dense(4 + 4 + 3, 5)
        l = ExplicitEdgeConv(nn, initialgraph=gh)
        ps, st = setup(RNG, l)
        assert st["phi"] == {}
        assert st["graph"] == gh
        y, _ = l(u, ps, st)
        assert y.shape == (3, 5)

    def test_extra_ndata_keys_concatenated(self):
        gh = tiny(ndata={"x": np.random.rand(3, 3).astype(np.float32),
                         "z": np.random.rand(3, 2).astype(np.float32)})
        u = jnp.asarray(np.random.randn(3, 4).astype(np.float32))
        # features: (u,z) for i and j plus pos-diff: (4+2)*2 + 3 = 15
        nn = Dense(15, 5)
        l = ExplicitEdgeConv(nn, initialgraph=gh)
        ps, st = setup(RNG, l)
        y, _ = l(u, ps, st)
        assert y.shape == (3, 5)


class TestVMHConv:
    def test_shape_and_state(self):
        # reference test/runtests.jl:39-54
        gh = tiny(ndata={"x": np.random.rand(3, 3).astype(np.float32)})
        u = jnp.asarray(np.random.randn(3, 4).astype(np.float32))
        phi = Dense(4 + 4 + 3, 5)
        gamma = Dense(5 + 4, 7)
        l = VMHConv(phi, gamma, initialgraph=gh)
        ps, st = setup(RNG, l)
        assert st["phi"] == {} and st["gamma"] == {}
        assert st["graph"] == gh
        y, _ = l(u, ps, st)
        assert y.shape == (3, 7)

    def test_message_uses_differences(self):
        # With identical node embeddings, h_j - h_i = 0; ϕ restricted to the
        # h-difference slot must produce the same message for all edges.
        gh = tiny(ndata={"x": np.zeros((3, 1), np.float32)})
        u = jnp.ones((3, 2))
        phi = Dense(2 + 2 + 1, 3)
        gamma = Dense(3 + 2, 2)
        l = VMHConv(phi, gamma, initialgraph=gh)
        ps, st = setup(RNG, l)
        y, _ = l(u, ps, st)
        # all nodes identical inputs -> identical outputs
        assert np.allclose(np.asarray(y[0]), np.asarray(y[1]), atol=1e-6)


class TestMPPDEConv:
    def _nets(self, h=5, u=2, x=3, th=4, out=7):
        phi = Dense(h + h + u + x + th, 5)
        psi = Dense(h + 5 + th, out)
        return phi, psi

    def test_with_theta(self):
        # reference test/runtests.jl:57-73
        gh = tiny(ndata={"u": np.random.rand(3, 2).astype(np.float32),
                         "x": np.random.rand(3, 3).astype(np.float32)},
                  gdata={"theta": np.random.rand(4).astype(np.float32)})
        h = jnp.asarray(np.random.randn(3, 5).astype(np.float32))
        phi, psi = self._nets()
        l = MPPDEConv(phi, psi, initialgraph=gh)
        ps, st = setup(RNG, l)
        assert st["graph"] == gh
        y, st2 = l(h, ps, st)
        assert st2["graph"] == gh
        assert y.shape == (3, 7)

    def test_edge_feature_mode(self):
        # reference test/runtests.jl:75-87: differences pre-stored in edata
        gh = tiny(edata={"u": np.random.rand(4, 2).astype(np.float32),
                         "x": np.random.rand(4, 3).astype(np.float32)},
                  gdata={"theta": np.random.rand(4).astype(np.float32)})
        h = jnp.asarray(np.random.randn(3, 5).astype(np.float32))
        phi, psi = self._nets()
        l = MPPDEConv(phi, psi, initialgraph=gh)
        ps, st = setup(RNG, l)
        y, _ = l(h, ps, st)
        assert y.shape == (3, 7)

    def test_batched_graph(self):
        # reference test/runtests.jl:89-102
        gh = tiny(ndata={"u": np.random.rand(3, 2).astype(np.float32),
                         "x": np.random.rand(3, 3).astype(np.float32)},
                  gdata={"theta": np.random.rand(4).astype(np.float32)})
        gb = batch([gh, gh.copy()])
        h = jnp.asarray(np.random.randn(6, 5).astype(np.float32))
        phi, psi = self._nets()
        l = MPPDEConv(phi, psi, initialgraph=gb)
        ps, st = setup(RNG, l)
        y, _ = l(h, ps, st)
        assert y.shape == (6, 7)

    def test_without_theta(self):
        # reference test/runtests.jl:104-120
        gh = tiny(ndata={"u": np.random.rand(3, 2).astype(np.float32),
                         "x": np.random.rand(3, 3).astype(np.float32)})
        h = jnp.asarray(np.random.randn(3, 5).astype(np.float32))
        phi = Dense(5 + 5 + 2 + 3, 5)
        psi = Dense(5 + 5, 7)
        l = MPPDEConv(phi, psi, initialgraph=gh)
        ps, st = setup(RNG, l)
        assert st["graph"] == gh
        y, st2 = l(h, ps, st)
        assert st2["graph"] == gh
        assert y.shape == (3, 7)

    def test_theta_gets_no_gradient(self):
        gh = tiny(ndata={"u": np.random.rand(3, 2).astype(np.float32),
                         "x": np.random.rand(3, 3).astype(np.float32)},
                  gdata={"theta": np.random.rand(4).astype(np.float32)})
        h = jnp.asarray(np.random.randn(3, 5).astype(np.float32))
        phi, psi = self._nets()
        l = MPPDEConv(phi, psi, initialgraph=gh)
        ps, st = setup(RNG, l)

        def loss(ps):
            y, _ = l(h, ps, st)
            return jnp.sum(y ** 2)

        g = jax.grad(loss)(ps)
        assert np.isfinite(
            np.asarray(jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)))


class TestGNOConv:
    def test_ndata_mode_then_edata_mode(self):
        # reference test/runtests.jl:123-151
        gh = rand_graph(10, 6, seed=3)
        gh = gh.replace(ndata={"a": np.random.rand(10, 2).astype(np.float32),
                               "x": np.random.rand(10, 3).astype(np.float32)})
        in_chs, out_chs = 5, 7
        h = jnp.asarray(np.random.randn(10, in_chs).astype(np.float32))
        phi = Dense(2 + 2 + 3 + 3, in_chs * out_chs)
        l = GNOConv(in_chs, out_chs, phi, initialgraph=gh)
        ps, st = setup(RNG, l)
        y, st = l(h, ps, st)
        assert y.shape == (10, out_chs)

        # pure-edata mode via update_graph
        gh2 = gh.replace(ndata={},
                         edata=np.random.rand(6, 2 + 2 + 3 + 3).astype(np.float32))
        st = update_graph(st, gh2)
        y, st = l(h, ps, st)
        assert y.shape == (10, out_chs)

    def test_kernel_matvec_semantics(self):
        # ϕ ≡ constant identity-kernel ⇒ m_i = mean of neighbor h_j.
        g = GnnGraph.from_coo([0, 1], [2, 2], num_nodes=3,
                              ndata={"a": np.zeros((3, 1), np.float32)})
        in_chs = out_chs = 2

        class ConstPhi(Dense):
            def __call__(self, x, ps, st):
                E = x.shape[0]
                eye = jnp.eye(in_chs).reshape(1, -1)
                return jnp.tile(eye, (E, 1)), st

        phi = ConstPhi(2, in_chs * out_chs)
        l = GNOConv(in_chs, out_chs, phi, initialgraph=g, use_bias=False)
        ps, st = setup(RNG, l)
        ps["linear"]["weight"] = jnp.zeros_like(ps["linear"]["weight"])
        h = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [0.0, 0.0]])
        y, _ = l(h, ps, st)
        assert np.allclose(np.asarray(y[2]), [2.0, 3.0], atol=1e-6)
        assert np.allclose(np.asarray(y[0]), [0.0, 0.0], atol=1e-6)


class TestSpectralConv:
    def test_derivative_accuracy(self):
        # reference test/runtests.jl:153-162
        l = SpectralConv(100)
        ps, st = setup(RNG, l)
        x = jnp.linspace(0, 2 * jnp.pi, 101)[1:]
        dy, _ = l(jnp.sin(x), ps, st)
        assert float(jnp.sum((dy - jnp.cos(x)) ** 2)) < 1e-3
        dy, _ = l(jnp.cos(x), ps, st)
        assert float(jnp.sum((dy + jnp.sin(x)) ** 2)) < 1e-3

    def test_matrix_input(self):
        l = SpectralConv(50)
        ps, st = setup(RNG, l)
        x = jnp.linspace(0, 2 * jnp.pi, 51)[1:]
        u = jnp.stack([jnp.sin(x), jnp.cos(x)], axis=-1)
        dy, _ = l(u, ps, st)
        assert dy.shape == (50, 2)
        assert float(jnp.mean((dy[:, 0] - jnp.cos(x)) ** 2)) < 1e-4


class TestJitAndGrad:
    """The rebuild's additions over the reference suite: every layer must be
    jittable and give finite grads (SURVEY §4 gap list)."""

    def _layers(self):
        gh = tiny(ndata={"x": np.random.rand(3, 3).astype(np.float32)})
        yield (GCNConv(4, 5, initialgraph=tiny()),
               jnp.asarray(np.random.randn(3, 4).astype(np.float32)))
        yield (ExplicitEdgeConv(Dense(4 + 4 + 3, 5), initialgraph=gh),
               jnp.asarray(np.random.randn(3, 4).astype(np.float32)))
        yield (VMHConv(Dense(4 + 4 + 3, 5), Dense(5 + 4, 7), initialgraph=gh),
               jnp.asarray(np.random.randn(3, 4).astype(np.float32)))

    def test_jit_and_grad(self):
        for l, x in self._layers():
            ps, st = setup(RNG, l)

            @jax.jit
            def fwd(x, ps, st):
                y, st = l(x, ps, st)
                return jnp.sum(y ** 2), st

            val, _ = fwd(x, ps, st)
            assert np.isfinite(float(val))
            grads = jax.grad(lambda ps: fwd(x, ps, st)[0])(ps)
            for leaf in jax.tree_util.tree_leaves(grads):
                assert np.all(np.isfinite(np.asarray(leaf)))


class TestFeatureConcatOrder:
    def test_multi_key_concat_order_matches_declaration(self):
        """With >=2 extra ndata keys declared in non-alphabetical order, the
        message concat must follow declaration order (reference NamedTuple
        semantics, src/layers.jl:106) — verified against a manual NumPy
        computation through a jitted forward."""
        rng = np.random.RandomState(0)
        pos = rng.rand(3, 3).astype(np.float32)
        z = rng.rand(3, 2).astype(np.float32)
        a = rng.rand(3, 4).astype(np.float32)
        # declaration order: x(pos), z, a — NOT alphabetical
        gh = tiny(ndata={"x": pos, "z": z, "a": a})
        u = rng.randn(3, 5).astype(np.float32)
        in_dim = (5 + 2 + 4) * 2 + 3
        l = ExplicitEdgeConv(Dense(in_dim, 1), initialgraph=gh, aggr="sum")
        ps, st = setup(RNG, l)

        y = np.asarray(jax.jit(lambda u, ps, st: l(u, ps, st)[0])(
            jnp.asarray(u), ps, st))

        W = np.asarray(ps["weight"])
        b = np.asarray(ps["bias"])
        feats_n = np.concatenate([u, z, a], axis=-1)  # declared order
        want = np.zeros((3, 1), np.float32)
        for s, t in zip(S, T):
            e = np.concatenate([feats_n[t], feats_n[s], pos[s] - pos[t]])
            want[t] += (e @ W + b).ravel()
        assert np.allclose(y, want, atol=1e-5), (y, want)
