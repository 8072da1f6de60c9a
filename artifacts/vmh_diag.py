"""Diagnose the r3 VMH plateau: is the full-batch gradient's SIGN stable
across solver tolerances at the recorded epoch-200 parameters?

Rprop is sign-driven; if the rtol=1e-5 solve flips gradient signs vs a
tight (1e-7/1e-9-ish) solve, the plateau is solver noise and the fix is
tightening rtol (VERDICT r3 Missing #1/#2). Also times one full-batch
gradient per rtol to budget the 200-epoch rerun.

Run: python artifacts/vmh_diag.py  (on the TPU tunnel)
"""
import os, sys, time, pickle
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neuralgraphpde import precompute, setup, update_graph
from neuralgraphpde.data.pde import convection_diffusion_dataset
from neuralgraphpde.models import vmh_model

SIMS, POINTS = 24, 3000
data = convection_diffusion_dataset(num_sims=SIMS, num_points=POINTS,
                                    t_end=0.2, num_saves=21, seed=0)
saveat = tuple(np.asarray(data.ts))
u = jnp.asarray(data.u)

ckpt = os.path.join(os.path.dirname(__file__), "vmh_parity.ckpt.pkl")
with open(ckpt, "rb") as f:
    saved = pickle.load(f)
print(f"params from epoch {saved['epoch']}", flush=True)


def fullbatch_grad(rtol, chk_steps, mb=4):
    model = vmh_model(1, 2, hidden=60, msg_dim=40, depth=3,
                      tspan=(saveat[0], saveat[-1]), saveat=saveat,
                      rtol=rtol, atol=1e-3, adjoint="checkpoint",
                      checkpoint_steps=chk_steps)
    ps, st = setup(jax.random.PRNGKey(0), model)
    ps = jax.tree_util.tree_map(lambda a, b: jnp.asarray(b), ps, saved["ps"])
    st = update_graph(st, precompute(data.graph, dense=False))

    def loss_fn(ps, u_batch, st):
        def one(u_traj):
            pred, _ = model(u_traj[0], ps, st)
            return jnp.mean((pred - u_traj) ** 2)
        return jnp.mean(jax.vmap(one)(u_batch))

    @jax.jit
    def micro(ps, acc, u_mb, st):
        l, g = jax.value_and_grad(loss_fn)(ps, u_mb, st)
        return jax.tree_util.tree_map(jnp.add, acc, g), l

    acc = jax.tree_util.tree_map(jnp.zeros_like, ps)
    losses = []
    t0 = time.time()
    for i in range(SIMS // mb):
        acc, l = micro(ps, acc, u[i * mb:(i + 1) * mb], st)
    jax.block_until_ready(acc)
    t_compile = time.time() - t0
    # timed second pass (warm)
    acc = jax.tree_util.tree_map(jnp.zeros_like, ps)
    t0 = time.time()
    for i in range(SIMS // mb):
        acc, l = micro(ps, acc, u[i * mb:(i + 1) * mb], st)
        losses.append(l)
    jax.block_until_ready(acc)
    t_warm = time.time() - t0
    mse = float(jnp.mean(jnp.stack(losses)))
    return jax.device_get(acc), mse, t_compile, t_warm


def flat(g):
    return np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(g)])


import sys as _sys

_levels = [(1e-5, 128), (1e-6, 192), (1e-7, 256)]
if len(_sys.argv) > 1 and _sys.argv[1] == "tight":
    # is rtol=1e-7 itself sign-converged? compare against 1e-8
    _levels = [(1e-6, 192), (1e-7, 256), (1e-8, 384)]

results = {}
for rtol, chk in _levels:
    try:
        g, mse, tc, tw = fullbatch_grad(rtol, chk)
        gf = flat(g)
        n_nan = int(np.isnan(gf).sum())
        results[rtol] = gf
        print(f"rtol={rtol:g} chk={chk}: mse={mse:.5f} nan={n_nan} "
              f"|g|={np.linalg.norm(gf):.3e} compile+run={tc:.0f}s warm={tw:.1f}s",
              flush=True)
    except Exception as e:
        print(f"rtol={rtol:g} chk={chk}: FAILED {type(e).__name__}: {e}",
              flush=True)

keys = sorted(results)  # ascending -> keys[0] is the TIGHTEST rtol
ref = results[keys[0]]  # tightest rtol as truth
for k in keys[1:]:
    a, b = results[k], ref
    nz = (np.abs(b) > 0)
    agree = float((np.sign(a[nz]) == np.sign(b[nz])).mean())
    rel = float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30))
    print(f"sign agreement rtol={k:g} vs {keys[0]:g}: {agree:.4f}  "
          f"rel L2 diff: {rel:.3e}", flush=True)
