"""Training-infrastructure tests: optimizers, fit loop, checkpoint/resume,
debug utilities."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralgraphpde.train import adam, fit, make_train_step, rprop
from neuralgraphpde.utils.debug import finite_or_zero, global_norm


def quad_loss(params, target):
    return jnp.sum((params["w"] - target) ** 2)


def test_rprop_descends():
    params = {"w": jnp.asarray([5.0, -3.0])}
    target = jnp.asarray([1.0, 1.0])
    opt = rprop(0.1)
    opt_state = opt.init(params)
    step = make_train_step(quad_loss, opt, donate=False)
    losses = []
    for _ in range(50):
        params, opt_state, loss, _ = step(params, opt_state, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 1e-2


def test_fit_with_checkpoint_resume():
    target = jnp.asarray([2.0])
    batches = [(target,)]
    with tempfile.TemporaryDirectory() as d:
        params = {"w": jnp.asarray([0.0])}
        state = fit(quad_loss, params, adam(0.1), batches, epochs=5,
                    checkpoint_dir=d, checkpoint_every=2)
        assert state.step == 5
        # ``epochs`` is the TOTAL plan: resume completes the remainder
        # (5 done -> 3 more)
        state2 = fit(quad_loss, {"w": jnp.asarray([0.0])}, adam(0.1),
                     batches, epochs=8, checkpoint_dir=d, resume=True)
        assert state2.step == 8
        # resumed run continues descending from the restored point
        assert float(state2.params["w"][0]) > float(state.params["w"][0])


_KILL_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import os, sys
import jax.numpy as jnp
from neuralgraphpde.train import adam, fit

d = sys.argv[1]
KILL_AT = int(sys.argv[2])  # global batch index at which to die

def quad_loss(params, target):
    return jnp.sum((params["w"] - target) ** 2)

targets = [jnp.asarray([float(i)]) for i in range(2)]

class KillerBatches:
    def __init__(self):
        self.count = 0
    def __iter__(self):
        for t in targets:
            if self.count == KILL_AT:
                os._exit(9)  # simulated hard failure MID-EPOCH
            self.count += 1
            yield (t,)

fit(quad_loss, {"w": jnp.asarray([0.0])}, adam(0.1), KillerBatches(),
    epochs=6, checkpoint_dir=d, checkpoint_every=1)
os._exit(0)
"""


def test_fit_fault_injection_resume_bit_exact():
    """SURVEY §5.3 recovery contract: a run killed mid-epoch, resumed from
    its last epoch checkpoint, must land on BIT-IDENTICAL parameters to an
    uninterrupted run (same optimizer path — the resume skips exactly the
    already-trained leading batches)."""
    import subprocess
    import sys

    targets = [jnp.asarray([float(i)]) for i in range(2)]
    batches = [(t,) for t in targets]

    with tempfile.TemporaryDirectory() as d:
        ckpt = os.path.join(d, "ckpt")
        script = os.path.join(d, "killed_run.py")
        with open(script, "w") as f:
            f.write(_KILL_SCRIPT)
        env = dict(os.environ,
                   PYTHONPATH=os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))))
        # die at global batch 7: 3 full epochs (ckpt at step 6) + 1 batch
        proc = subprocess.run([sys.executable, script, ckpt, "7"], env=env,
                              capture_output=True, timeout=300)
        assert proc.returncode == 9, proc.stderr.decode()[-2000:]

        resumed = fit(quad_loss, {"w": jnp.asarray([0.0])}, adam(0.1),
                      batches, epochs=6, checkpoint_dir=ckpt, resume=True)
        clean = fit(quad_loss, {"w": jnp.asarray([0.0])}, adam(0.1),
                    batches, epochs=6)
        assert resumed.step == clean.step == 12
        for a, b in zip(jax.tree_util.tree_leaves(resumed.params),
                        jax.tree_util.tree_leaves(clean.params)):
            assert np.array_equal(np.asarray(a), np.asarray(b)), (a, b)


def test_step_heartbeat_fires_and_rearms():
    """StepHeartbeat (SURVEY §5.3 failure detection): no beat within the
    timeout fires on_stall; regular beats keep it silent."""
    import time

    from neuralgraphpde.train import StepHeartbeat

    stalls = []
    with StepHeartbeat(0.1, on_stall=stalls.append, poll_s=0.02) as hb:
        time.sleep(0.4)  # no beats -> at least one stall (re-armed)
    assert stalls and all(g > 0.1 for g in stalls)
    assert hb.stalls == len(stalls)

    stalls2 = []
    with StepHeartbeat(0.3, on_stall=stalls2.append, poll_s=0.02) as hb2:
        for _ in range(10):
            time.sleep(0.05)
            hb2.beat()
    assert not stalls2


def test_debug_utils():
    t = {"a": jnp.asarray([1.0, jnp.inf, jnp.nan])}
    clean = finite_or_zero(t)
    assert np.allclose(np.asarray(clean["a"]), [1.0, 0.0, 0.0])
    n = float(global_norm({"a": jnp.asarray([3.0, 4.0])}))
    assert abs(n - 5.0) < 1e-6


def test_data_parallel_step_matches_single_device():
    """DP step over the 8-device virtual mesh: replicated params, batch
    sharded on the leading axis, gradients averaged by GSPMD — must match
    the single-device step exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from neuralgraphpde import GCNConv, GnnGraph, setup, update_graph
    from neuralgraphpde.train import make_train_step, make_train_step_dp

    n = 16
    idx = np.arange(n)
    g = GnnGraph.from_coo(np.concatenate([idx, idx]),
                          np.concatenate([(idx + 1) % n, (idx - 1) % n]),
                          num_nodes=n)
    layer = GCNConv(4, 4, "tanh", initialgraph=g)
    ps, st = setup(jax.random.PRNGKey(0), layer)
    st = update_graph(st, g)

    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.normal(size=(8, n, 4)).astype(np.float32))
    yb = jnp.asarray(rng.normal(size=(8, n, 4)).astype(np.float32))

    def loss_fn(params, xb, yb):
        def one(x, y):
            out, _ = layer(x, params, st)
            return jnp.mean((out - y) ** 2)

        return jnp.mean(jax.vmap(one)(xb, yb))

    opt = optax.sgd(1e-2)
    step1 = make_train_step(loss_fn, opt, donate=False)
    ps1, _, loss1, _ = step1(ps, opt.init(ps), xb, yb)

    step8, mesh = make_train_step_dp(loss_fn, opt)
    assert mesh.size == 8
    ps8, _, loss8, _ = step8(ps, opt.init(ps), xb, yb)

    assert abs(float(loss1) - float(loss8)) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(ps1),
                    jax.tree_util.tree_leaves(ps8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
