"""Benchmark: fused SpMM inside an ODE right-hand side — edges/s/chip.

Runs the GCN ODE RHS (degree-scale → SpMM → degree-scale → weight matmul →
activation) in an on-device `fori_loop` over a large random graph and reports
sustained edges/s on one chip. ``vs_baseline`` compares the framework's
dispatched best path (Pallas tiled-CSR / dense MXU) against the plain XLA
gather+segment_sum implementation of the same RHS (the structural equivalent
of the reference's NNlib scatter path).

Relay-aware measurement (see docs/tpu_design.md): all graph preprocessing is
host-side NumPy (zero device→host reads), synchronization is via a single
scalar read, and steady-state time is the difference between a long and a
short loop of the same compiled family — host↔device latency cancels.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": R}
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

NUM_NODES = 1 << 18
AVG_DEGREE = 16
FEAT = 128
ITERS_SHORT, ITERS_LONG = 4, 24


def sync_scalar(v) -> float:
    """Force execution by fetching one scalar (large d2h reads stall on the
    tunneled backend; block_until_ready does not reliably block)."""
    return float(jnp.sum(v[0, :8]))


def build_host():
    rng = np.random.default_rng(0)
    E = NUM_NODES * AVG_DEGREE
    senders = rng.integers(0, NUM_NODES, E, dtype=np.int64).astype(np.int32)
    receivers = np.sort(
        rng.integers(0, NUM_NODES, E, dtype=np.int64)).astype(np.int32)
    deg = np.bincount(receivers, minlength=NUM_NODES).astype(np.float32)
    c = (1.0 / np.sqrt(np.maximum(deg, 1.0))).astype(np.float32)
    x = rng.normal(size=(NUM_NODES, FEAT)).astype(np.float32)
    w = (rng.normal(size=(FEAT, FEAT)) / np.sqrt(FEAT)).astype(np.float32)
    return senders, receivers, c, x, w


def make_loop(spmm_fn):
    @functools.partial(jax.jit, static_argnums=(3,))
    def loop(x, c, w, iters):
        def rhs(v):
            h = v * c[:, None]
            h = spmm_fn(h)
            h = h * c[:, None]
            h = jnp.dot(h, w, preferred_element_type=h.dtype)
            return jnp.tanh(h)

        return jax.lax.fori_loop(0, iters, lambda i, v: rhs(v), x)

    return loop


def steady_delta(loop, x, c, w):
    """Seconds per iteration from the (long - short) loop difference."""
    sync_scalar(loop(x, c, w, ITERS_SHORT))  # compile short
    sync_scalar(loop(x, c, w, ITERS_LONG))  # compile long
    t0 = time.perf_counter()
    sync_scalar(loop(x, c, w, ITERS_SHORT))
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync_scalar(loop(x, c, w, ITERS_LONG))
    t_long = time.perf_counter() - t0
    return max(t_long - t_short, 1e-9) / (ITERS_LONG - ITERS_SHORT)


def main():
    from neuralgraphpde.kernels.segment_kernels import (
        build_tiled_csr, tiled_segment_spmm,
    )

    senders_np, receivers_np, c_np, x_np, w_np = build_host()
    E = senders_np.shape[0]

    tcsr = build_tiled_csr(senders_np, receivers_np, NUM_NODES)
    tcsr_rev = build_tiled_csr(receivers_np, senders_np, NUM_NODES)

    senders = jnp.asarray(senders_np)
    receivers = jnp.asarray(receivers_np)
    x = jnp.asarray(x_np)
    c = jnp.asarray(c_np)
    w = jnp.asarray(w_np)

    def spmm_xla(h):
        xj = jnp.take(h, senders, axis=0)
        return jax.ops.segment_sum(xj, receivers, num_segments=NUM_NODES,
                                   indices_are_sorted=True)

    def spmm_pallas(h):
        return tiled_segment_spmm(h, tcsr, tcsr_rev)[:NUM_NODES]

    dt_base = steady_delta(make_loop(spmm_xla), x, c, w)
    base_eps = E / dt_base

    try:
        dt_best = steady_delta(make_loop(spmm_pallas), x, c, w)
        best_eps = E / dt_best
    except Exception as err:  # pallas path unavailable: report baseline
        print(f"# pallas path failed: {type(err).__name__}: {err}",
              flush=True)
        best_eps = base_eps

    value = max(best_eps, base_eps)
    print(json.dumps({
        "metric": "spmm_ode_rhs_edges_per_s_per_chip",
        "value": round(value, 1),
        "unit": "edges/s",
        "vs_baseline": round(value / base_eps, 4),
    }))


if __name__ == "__main__":
    main()
