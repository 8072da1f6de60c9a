"""Config 2 (BASELINE.json): VMHConv neural graph ODE on 2D
convection-diffusion over scattered nodes — the reference's VMH tutorial
(docs/src/tutorials/VMH.md) as a runnable script, including the
graph-rebind-per-batch pattern (VMH.md:134) and the published loss curve as
the parity target (BASELINE.md: 0.0272 @ epoch 10 → 0.00098 @ epoch 200).

CPU-quick: python examples/train_vmh.py --cpu --sims 4 --points 300 --epochs 20
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Config:
    num_sims: int = 24
    num_points: int = 3000
    t_end: float = 0.2
    num_saves: int = 21
    hidden: int = 60
    msg_dim: int = 40
    depth: int = 3
    optimizer: str = "rprop"  # reference uses Rprop (VMH.md:97)
    lr: float = 1e-3
    epochs: int = 200
    batch: int = 4
    seed: int = 0
    # 'checkpoint' = the reference's InterpolatingAdjoint analog (stable on
    # the diffusive dynamics); 'backsolve' = classic continuous adjoint.
    adjoint: str = "checkpoint"
    checkpoint_steps: int = 64
    log_every: int = 10
    log_path: str = ""


def main(cfg: Config):
    from neuralgraphpde import precompute, setup, update_graph
    from neuralgraphpde.data.pde import convection_diffusion_dataset
    from neuralgraphpde.models import vmh_model
    from neuralgraphpde.train import MetricsLogger, adam, rprop

    data = convection_diffusion_dataset(
        num_sims=cfg.num_sims, num_points=cfg.num_points, t_end=cfg.t_end,
        num_saves=cfg.num_saves, seed=cfg.seed)

    saveat = tuple(np.asarray(data.ts))
    model = vmh_model(1, 2, hidden=cfg.hidden, msg_dim=cfg.msg_dim,
                      depth=cfg.depth, tspan=(saveat[0], saveat[-1]),
                      saveat=saveat, rtol=1e-3, atol=1e-3,
                      adjoint=cfg.adjoint,
                      checkpoint_steps=cfg.checkpoint_steps)
    ps, st = setup(jax.random.PRNGKey(cfg.seed), model)
    # all sims share one graph: bind it once (re-bind per batch when graphs
    # differ — the update_graph pattern). precompute attaches the Pallas
    # aggregation tiling + cached degrees for the solver hot loop.
    st = update_graph(st, precompute(data.graph, dense=False))

    u = jnp.asarray(data.u)  # (S, T, M, 1)

    # CRITICAL for the tunneled TPU backend: ``u`` and ``st`` (graph arrays +
    # kernel tilings) must be jit ARGUMENTS, not closure captures — captured
    # arrays are embedded as HLO literal constants, and multi-MB literals make
    # the relay compile pathologically slow (the r2 HLO-literal lesson).
    def loss_fn(ps, u_batch, st):
        def one(u_traj):
            pred, _ = model(u_traj[0], ps, st)
            return jnp.mean((pred - u_traj) ** 2)

        return jnp.mean(jax.vmap(one)(u_batch))

    opt = rprop(cfg.lr) if cfg.optimizer == "rprop" else adam(cfg.lr)
    opt_state = opt.init(ps)
    logger = MetricsLogger(path=cfg.log_path or None)
    import time as _time

    import optax as _optax

    # The whole epoch loop runs ON DEVICE (lax.scan over epochs, inner scan
    # over shuffled batches): the TPU relay has seconds-scale per-execute
    # latency, so host-driven step loops dominate wall clock. One execute
    # covers ``log_every`` epochs; only the logged scalars cross the link.
    steps_per_epoch = max(cfg.num_sims // cfg.batch, 1)

    @jax.jit
    def run_chunk(ps, opt_state, keys, u, st):
        # bodies close over the TRACED u/st (jit args) — no literal capture
        def batch_body(carry, idx):
            ps, opt_state = carry
            ub = jnp.take(u, idx, axis=0)
            loss, grads = jax.value_and_grad(loss_fn)(ps, ub, st)
            updates, opt_state = opt.update(grads, opt_state, ps)
            ps = _optax.apply_updates(ps, updates)
            return (ps, opt_state), loss

        def epoch_body(carry, key):
            perm = jax.random.permutation(key, cfg.num_sims)
            idxs = perm[: steps_per_epoch * cfg.batch].reshape(
                steps_per_epoch, cfg.batch)
            carry, losses = jax.lax.scan(batch_body, carry, idxs)
            return carry, jnp.mean(losses)

        (ps, opt_state), mses = jax.lax.scan(epoch_body, (ps, opt_state),
                                             keys)
        return ps, opt_state, mses
    log_every = cfg.log_every
    key = jax.random.PRNGKey(cfg.seed + 1)
    t0 = _time.time()
    epoch = 0
    while epoch < cfg.epochs:
        n = min(log_every, cfg.epochs - epoch)
        key, sub = jax.random.split(key)
        ps, opt_state, mses = run_chunk(ps, opt_state,
                                        jax.random.split(sub, n), u, st)
        epoch += n
        rec = logger.log(epoch, train_mse=float(mses[-1]))
        print(f"epoch {epoch:4d} | train mse {rec['train_mse']:.5f} "
              f"| {_time.time()-t0:.0f}s", flush=True)
    return logger


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--sims", type=int, default=24)
    p.add_argument("--points", type=int, default=3000)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--optimizer", default="rprop")
    p.add_argument("--adjoint", default="checkpoint")
    p.add_argument("--log-path", default="")
    # epochs per device-side execute: long single executes can trip relay
    # worker watchdogs — 1 keeps each execute seconds-scale
    p.add_argument("--log-every", type=int, default=10)
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    main(Config(num_sims=args.sims, num_points=args.points,
                epochs=args.epochs, optimizer=args.optimizer,
                adjoint=args.adjoint, log_path=args.log_path,
                log_every=args.log_every))
