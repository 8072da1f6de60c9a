"""ODE solver tests: convergence on known solutions, adaptive accuracy,
adjoint gradients (vs numerical and vs checkpointed scan), NeuralGraphODE."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralgraphpde import GCNConv, GnnGraph, setup
from neuralgraphpde.ode import NeuralGraphODE, odeint, odeint_grid


def test_grid_rk4_convergence_linear():
    # dy/dt = -y, y(0)=1 -> y(t)=exp(-t)
    rhs = lambda t, y, args: -y
    ts = jnp.asarray([0.0, 1.0])
    y0 = jnp.ones(())
    y = odeint_grid(rhs, y0, ts, solver="rk4", steps_per_interval=20)
    assert abs(float(y[-1]) - np.exp(-1)) < 1e-6


def test_grid_hits_save_points():
    rhs = lambda t, y, args: jnp.cos(t) * jnp.ones_like(y)
    ts = jnp.linspace(0.0, 2.0, 9)
    y = odeint_grid(rhs, jnp.zeros(()), ts, solver="rk4",
                    steps_per_interval=4)
    assert y.shape == (9,)
    assert np.allclose(np.asarray(y), np.sin(np.asarray(ts)), atol=1e-6)


@pytest.mark.parametrize("solver", ["tsit5", "dopri5"])
def test_adaptive_accuracy(solver):
    # stiff-ish oscillator: y'' = -omega^2 y
    omega = 5.0

    def rhs(t, y, args):
        p, v = y
        return (v, -(omega ** 2) * p)

    ts = jnp.linspace(0.0, 2.0, 5)
    ys = odeint(rhs, (jnp.ones(()), jnp.zeros(())), ts, solver=solver,
                rtol=1e-7, atol=1e-9)
    p_end = float(ys[0][-1])
    assert abs(p_end - np.cos(omega * 2.0)) < 1e-4


def test_adaptive_with_args_and_pytree():
    def rhs(t, y, args):
        a = args["rate"]
        return {"u": -a * y["u"]}

    ts = jnp.asarray([0.0, 0.5, 1.0])
    ys = odeint(rhs, {"u": jnp.ones((3,))}, ts, {"rate": jnp.asarray(2.0)})
    assert ys["u"].shape == (3, 3)
    assert np.allclose(np.asarray(ys["u"][-1]), np.exp(-2.0), atol=1e-4)


def test_backsolve_gradient_matches_analytic():
    # y' = a*y ; y(1) = y0*exp(a); dL/da for L=y(1): y0*exp(a)
    def rhs(t, y, args):
        return args * y

    def loss(a):
        ys = odeint(rhs, jnp.ones(()), jnp.asarray([0.0, 1.0]), a,
                    rtol=1e-8, atol=1e-10)
        return ys[-1]

    a = jnp.asarray(0.7)
    g = jax.grad(loss)(a)
    assert abs(float(g) - np.exp(0.7)) < 1e-3


def test_backsolve_gradient_y0():
    def rhs(t, y, args):
        return -y

    def loss(y0):
        ys = odeint(rhs, y0, jnp.asarray([0.0, 1.0]), rtol=1e-8, atol=1e-10)
        return jnp.sum(ys[-1] ** 2)

    y0 = jnp.asarray([1.0, 2.0])
    g = jax.grad(loss)(y0)
    want = 2 * np.asarray([1.0, 2.0]) * np.exp(-2.0)
    assert np.allclose(np.asarray(g), want, atol=1e-4)


def test_grid_checkpoint_gradient():
    def rhs(t, y, args):
        return args * jnp.sin(y)

    def loss(a):
        ys = odeint_grid(rhs, jnp.ones(()), jnp.asarray([0.0, 1.0]), a,
                         solver="rk4", steps_per_interval=32)
        return ys[-1]

    a = jnp.asarray(1.3)
    g = float(jax.grad(loss)(a))
    eps = 1e-4
    gnum = (float(loss(a + eps)) - float(loss(a - eps))) / (2 * eps)
    # float32 central differences carry ~1e-3 noise at this eps
    assert abs(g - gnum) < 5e-3


def test_adjoint_consistency_backsolve_vs_grid():
    """Both adjoints must agree on a smooth nonlinear problem."""
    def rhs(t, y, args):
        w = args
        return jnp.tanh(w @ y)

    w = jnp.asarray(np.random.default_rng(0).normal(size=(3, 3)).astype(np.float32)) * 0.5
    y0 = jnp.asarray([0.3, -0.2, 0.1])
    ts = jnp.asarray([0.0, 1.0])

    def loss_adaptive(w):
        return jnp.sum(odeint(rhs, y0, ts, w, rtol=1e-8, atol=1e-10)[-1] ** 2)

    def loss_grid(w):
        return jnp.sum(odeint_grid(rhs, y0, ts, w, solver="rk4",
                                   steps_per_interval=64)[-1] ** 2)

    ga = jax.grad(loss_adaptive)(w)
    gg = jax.grad(loss_grid)(w)
    assert np.allclose(np.asarray(ga), np.asarray(gg), atol=1e-3)


@pytest.mark.slow
def test_neural_graph_ode_forward_and_grad():
    """GRAND-style: GCN as ODE RHS over a small graph (BASELINE config 1
    shape), trained end-to-end through the solve."""
    g = GnnGraph.from_coo([0, 0, 1, 2, 2, 3], [1, 2, 0, 0, 3, 2], num_nodes=4)
    layer = GCNConv(4, 4, "tanh", initialgraph=g)
    node = NeuralGraphODE(layer, tspan=(0.0, 1.0), rtol=1e-6, atol=1e-6)
    ps, st = setup(jax.random.PRNGKey(0), node)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 4)).astype(np.float32))

    ys, st2 = node(x, ps, st)
    assert ys.shape == (2, 4, 4)
    assert st2["model"]["graph"] == g

    def loss(ps):
        ys, _ = node(x, ps, st)
        return jnp.sum(ys[-1] ** 2)

    grads = jax.grad(loss)(ps)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # also through jit
    lj = jax.jit(loss)(ps)
    assert np.isfinite(float(lj))


def test_neural_graph_ode_checkpoint_adjoint():
    g = GnnGraph.from_coo([0, 1, 2], [1, 2, 0], num_nodes=3)
    layer = GCNConv(2, 2, "tanh", initialgraph=g)
    node = NeuralGraphODE(layer, tspan=(0.0, 1.0), adjoint="checkpoint",
                          solver="rk4", steps_per_interval=16, output="last")
    ps, st = setup(jax.random.PRNGKey(0), node)
    x = jnp.ones((3, 2))
    y, _ = node(x, ps, st)
    assert y.shape == (3, 2)
    grads = jax.grad(lambda p: jnp.sum(node(x, p, st)[0] ** 2))(ps)
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(grads))


def test_saveat_rollout():
    g = GnnGraph.from_coo([0, 1], [1, 0], num_nodes=2)
    layer = GCNConv(1, 1, initialgraph=g)
    saveat = tuple(np.linspace(0, 1, 6))
    node = NeuralGraphODE(layer, tspan=(0.0, 1.0), saveat=saveat)
    ps, st = setup(jax.random.PRNGKey(0), node)
    ys, _ = node(jnp.ones((2, 1)), ps, st)
    assert ys.shape == (6, 2, 1)


def test_solve_stats_counts_steps():
    from neuralgraphpde.ode import solve_stats

    rhs = lambda t, y, args: -y
    ys, attempts = solve_stats(rhs, jnp.ones(()), jnp.asarray([0.0, 1.0, 2.0]),
                               rtol=1e-6, atol=1e-8)
    assert ys.shape == (3,)
    assert attempts.shape == (2,)
    assert int(attempts.sum()) > 0
    assert np.allclose(float(ys[-1]), np.exp(-2.0), atol=1e-5)


@pytest.mark.parametrize("solver,order", [
    ("euler", 1), ("midpoint", 2), ("heun", 2), ("rk4", 4),
])
def test_fixed_solver_convergence_order(solver, order):
    """Halving the step size must reduce error by ~2^order."""
    rhs = lambda t, y, args: -2.0 * y
    ts = jnp.asarray([0.0, 1.0])
    exact = np.exp(-2.0)

    def err(n):
        y = odeint_grid(rhs, jnp.ones(()), ts, solver=solver,
                        steps_per_interval=n)
        return abs(float(y[-1]) - exact)

    e1, e2 = err(16), err(32)
    rate = np.log2(e1 / max(e2, 1e-12))
    assert rate > order - 0.6, f"{solver}: observed rate {rate}"


def test_odeint_dense_output_accuracy():
    """Hermite dense output hits dense save grids accurately without
    clamping steps to them (y' = cos t, y = sin t)."""
    def rhs(t, y, args):
        return jnp.cos(t)

    ts = jnp.linspace(0.0, 3.0, 61)  # save grid much denser than step size
    y_h = odeint(rhs, jnp.zeros(()), ts, rtol=1e-7, atol=1e-9)
    y_t = odeint(rhs, jnp.zeros(()), ts, rtol=1e-7, atol=1e-9,
                 interpolation="tstop")
    want = np.sin(np.asarray(ts))
    # cubic Hermite is 3rd-order: interpolation error ~ (dt^4/384)·|y''''|
    # with the big free steps this easy RHS allows — O(1e-4) here
    assert np.allclose(np.asarray(y_h), want, atol=3e-4)
    assert np.allclose(np.asarray(y_t), want, atol=1e-6)
    # it is interpolation, not a coarser solve: endpoints of the solve
    # itself stay at solver accuracy
    assert abs(float(y_h[-1]) - want[-1]) < 1e-5


def test_odeint_dense_output_gradient():
    def rhs(t, y, args):
        return -args * y

    ts = jnp.linspace(0.0, 1.0, 11)

    def loss(a):
        return jnp.sum(odeint(rhs, jnp.ones(()), ts, a,
                              rtol=1e-8, atol=1e-10)[-1])

    g = jax.grad(loss)(jnp.asarray(0.7))
    # d/da e^{-a} = -e^{-a}
    assert abs(float(g) + np.exp(-0.7)) < 1e-3


def test_odeint_interpolation_validation():
    def rhs(t, y, args):
        return -y

    try:
        odeint(rhs, jnp.ones(()), jnp.asarray([0.0, 1.0]),
               interpolation="cubic?")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# ----------------------------------------- checkpointed (discrete) adjoint
def test_checkpoint_adjoint_matches_backsolve_smooth():
    """On benign dynamics both adjoints agree with each other and with the
    analytic gradient (same setup as the backsolve test)."""
    def rhs(t, y, args):
        return args * y

    ts = jnp.asarray([0.0, 1.0])

    def loss(a, adjoint):
        ys = odeint(rhs, jnp.asarray(1.5), ts, a, rtol=1e-8, atol=1e-10,
                    adjoint=adjoint)
        return ys[-1]

    a = jnp.asarray(0.7)
    g_chk = float(jax.grad(loss)(a, "checkpoint"))
    g_bs = float(jax.grad(loss)(a, "backsolve"))
    want = 1.5 * np.exp(0.7)
    assert abs(g_chk - want) < 1e-3
    assert abs(g_chk - g_bs) < 1e-3


@pytest.mark.slow
def test_checkpoint_adjoint_stable_on_diffusion_where_backsolve_diverges():
    """The reference trains through InterpolatingAdjoint on *dissipative*
    graph dynamics (GRAND diffusion, graph_node.md:54-66). The continuous
    backsolve adjoint integrates the state backwards, which explodes
    exponentially for diffusion; the checkpointed discrete adjoint replays
    forward steps and stays exact. Ground truth: autodiff through a fine
    fixed-grid solve."""
    # GCN-style nonlinear diffusion on a ring: du/dt = s*(A_norm tanh(u) - u)
    # — dissipative (states contract toward 0 over the span), and *nonlinear*
    # so the RHS VJP depends on the state the backsolve must reconstruct by
    # integrating the contraction backwards (exponentially unstable).
    n, F = 16, 4
    idx = np.arange(n)
    s_np = np.concatenate([idx, idx])
    r_np = np.concatenate([(idx + 1) % n, (idx - 1) % n])
    A = np.zeros((n, n), np.float32)
    A[r_np, s_np] = 0.5  # symmetric-normalized ring adjacency (deg 2)
    A_hat = jnp.asarray(A)
    scale = 3.0
    tspan = 6.0

    def rhs(t, y, args):
        return scale * (A_hat @ jnp.tanh(y) - y)

    rng = np.random.default_rng(0)
    y0 = jnp.asarray(rng.normal(size=(n, F)).astype(np.float32) * 2.0)
    ts = jnp.asarray([0.0, tspan])

    def loss(y0, adjoint):
        ys = odeint(rhs, y0, ts, rtol=1e-6, atol=1e-8, adjoint=adjoint,
                    checkpoint_steps=256, max_steps=4096)
        return jnp.sum(ys[-1] ** 2)

    def loss_grid(y0):
        ys = odeint_grid(rhs, y0, ts, solver="rk4", steps_per_interval=600)
        return jnp.sum(ys[-1] ** 2)

    g_true = np.asarray(jax.grad(loss_grid)(y0))
    g_chk = np.asarray(jax.grad(loss, argnums=0)(y0, "checkpoint"))
    g_bs = np.asarray(jax.grad(loss, argnums=0)(y0, "backsolve"))

    ref = np.max(np.abs(g_true)) + 1e-30
    err_chk = np.max(np.abs(g_chk - g_true)) / ref
    err_bs = np.max(np.abs(g_bs - g_true)) / ref
    assert err_chk < 1e-3, f"checkpoint adjoint off by {err_chk}"
    # backsolve must *visibly* diverge on this problem (the point of the
    # test): measured ~1.0 rel err (gradient destroyed) vs 7e-7 for the
    # checkpointed adjoint
    assert not np.isfinite(err_bs) or err_bs > 0.1, (
        f"expected backsolve divergence, got rel err {err_bs}")


def test_checkpoint_adjoint_params_and_ts_gradients():
    """Gradients flow to args (params) and ts; multiple save points."""
    def rhs(t, y, args):
        return -args["k"] * y + jnp.sin(t)

    ts = jnp.linspace(0.0, 2.0, 5)
    args = {"k": jnp.asarray(1.3)}

    def loss(args):
        ys = odeint(rhs, jnp.asarray(1.0), ts, args, adjoint="checkpoint")
        return jnp.sum(ys ** 2)

    g = jax.grad(loss)(args)
    # finite difference
    eps = 1e-3
    lp = loss({"k": args["k"] + eps})
    lm = loss({"k": args["k"] - eps})
    fd = (float(lp) - float(lm)) / (2 * eps)
    assert abs(float(g["k"]) - fd) < 5e-3 * max(1.0, abs(fd))


def test_checkpoint_adjoint_overflow_poisons_with_nan():
    """If a save interval needs more accepted steps than checkpoint_steps,
    gradients come back NaN (visible failure) rather than silently wrong."""
    def rhs(t, y, args):
        return jnp.cos(40.0 * t) * y

    def loss(y0):
        ys = odeint(rhs, y0, jnp.asarray([0.0, 5.0]), rtol=1e-8, atol=1e-10,
                    adjoint="checkpoint", checkpoint_steps=4)
        return jnp.sum(ys[-1] ** 2)

    g = jax.grad(loss)(jnp.asarray(1.0))
    assert not np.isfinite(float(g))


@pytest.mark.slow
def test_checkpoint_adjoint_through_neural_graph_ode():
    g = GnnGraph.from_coo([0, 1, 2], [1, 2, 0], num_nodes=3)
    layer = GCNConv(2, 2, "tanh", initialgraph=g)
    node = NeuralGraphODE(layer, tspan=(0.0, 1.0), adjoint="checkpoint",
                          output="last")
    ps, st = setup(jax.random.PRNGKey(0), node)
    x = jnp.ones((3, 2))
    y, _ = node(x, ps, st)
    assert y.shape == (3, 2)
    grads = jax.grad(lambda p: jnp.sum(node(x, p, st)[0] ** 2))(ps)
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(grads))
    # agrees with the fixed-grid discrete adjoint
    node_grid = NeuralGraphODE(layer, tspan=(0.0, 1.0), adjoint="grid",
                               solver="rk4", steps_per_interval=64,
                               output="last")
    g1 = jax.grad(lambda p: jnp.sum(node(x, p, st)[0] ** 2))(ps)
    g2 = jax.grad(lambda p: jnp.sum(node_grid(x, p, st)[0] ** 2))(ps)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_checkpoint_hermite_dense_saveat_gradient():
    """Hermite-checkpoint adjoint on a DENSE saveat grid (many saves per
    solver step — the rollout-training shape): gradients must match central
    differences and the tstop-checkpoint adjoint."""
    def rhs(t, y, args):
        return args * jnp.sin(y) - 0.3 * y

    ts = jnp.linspace(0.0, 1.0, 21)

    def loss(a, interp):
        ys = odeint(rhs, jnp.asarray([0.8, -0.4]), ts, a, rtol=1e-6,
                    atol=1e-8, adjoint="checkpoint", interpolation=interp,
                    checkpoint_steps=64)
        return jnp.sum(ys ** 2)

    a = jnp.asarray(1.1)
    g_h = float(jax.grad(loss)(a, "hermite"))
    g_t = float(jax.grad(loss)(a, "tstop"))
    eps = 1e-3
    gnum = (float(loss(a + eps, "hermite")) -
            float(loss(a - eps, "hermite"))) / (2 * eps)
    # float32 central differences on a ~30-magnitude gradient carry ~0.1
    # noise; the float64 cross-check (hermite vs tstop vs backsolve vs
    # numeric all within 1e-7 relative) lives in the adjoint derivation.
    assert abs(g_h - gnum) < 0.01 * abs(gnum), (g_h, gnum)
    assert abs(g_h - g_t) < 0.01 * abs(g_t), (g_h, g_t)


def test_checkpoint_hermite_forward_matches_backsolve_forward():
    """Forward values are the same free-stepping hermite solve regardless of
    which adjoint will be used."""
    def rhs(t, y, args):
        return -y + jnp.sin(3.0 * t)

    ts = jnp.linspace(0.0, 2.0, 9)
    y0 = jnp.asarray([1.0, 0.5])
    ys_c = odeint(rhs, y0, ts, adjoint="checkpoint", interpolation="hermite")
    ys_b = odeint(rhs, y0, ts, adjoint="backsolve", interpolation="hermite")
    assert np.allclose(np.asarray(ys_c), np.asarray(ys_b), atol=0)


def test_checkpoint_hermite_overflow_poisons():
    """A checkpoint_steps bound too small for the whole span must yield NaN
    gradients (visible failure), never silently-wrong numbers."""
    def rhs(t, y, args):
        return args * jnp.cos(10.0 * t) * y

    def loss(a):
        ys = odeint(rhs, jnp.ones(()), jnp.asarray([0.0, 5.0]), a,
                    rtol=1e-9, atol=1e-11, adjoint="checkpoint",
                    interpolation="hermite", checkpoint_steps=2)
        return ys[-1]

    g = jax.grad(loss)(jnp.asarray(0.9))
    assert not np.isfinite(float(g))


def test_checkpoint_hermite_y0_gradient():
    def rhs(t, y, args):
        return -y

    ts = jnp.linspace(0.0, 1.0, 5)

    def loss(y0):
        ys = odeint(rhs, y0, ts, rtol=1e-8, atol=1e-10,
                    adjoint="checkpoint", interpolation="hermite")
        return jnp.sum(ys[-1] ** 2)

    y0 = jnp.asarray([1.0, 2.0])
    g = jax.grad(loss)(y0)
    want = 2 * np.asarray([1.0, 2.0]) * np.exp(-2.0)
    assert np.allclose(np.asarray(g), want, atol=1e-4)
