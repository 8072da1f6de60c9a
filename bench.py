"""Benchmark: fused SpMM inside an ODE right-hand side — edges/s/chip.

Primary metric: the GCN ODE RHS (degree-scale → SpMM → degree-scale →
weight matmul → activation) on a 512x512 8-neighborhood grid mesh — the
framework's actual domain (the reference's workloads are PDE meshes:
Delaunay in VMH.md, grids in the MP-PDE/GNO configs), run in an on-device
``fori_loop`` and reported as sustained edges/s on one chip. ``vs_baseline``
compares the best framework path against the plain XLA gather+segment_sum
implementation of the same RHS on the same mesh (the structural equivalent
of the reference's NNlib scatter path).

Paths:
- ``xla``         — gather + scatter-add baseline.
- ``tcsr_bf16``   — Pallas tiled-CSR one-hot-MXU kernel, bf16 gather traffic,
                    f32 accumulation (the general-graph path).
- ``banded_f32``  — Pallas streaming banded-block kernel, exact f32
                    (HIGHEST-precision MXU passes), zero gather.
- ``banded_bf16`` — banded kernel with bf16 band/x traffic, f32 accumulation.

A random-graph secondary (2^18 nodes, deg 16: xla vs tcsr_bf16) is printed
as a comment line for regression tracking of the gather path.

Robustness (see docs/tpu_design.md): the tunneled TPU backend has
minute-scale compile/session-warmup variance, stalls on large device→host
reads, and hangs when the persistent compilation cache tries to ship
serialized executables through the relay (so no compilation cache here).
All paths run in ONE worker subprocess that streams each result to a file
as it lands; the parent enforces an overall timeout and harvests whatever
completed. Sync is via small scalar reads only; steady-state time is the
difference between a long and a short loop of the same compiled family.

Prints ONE JSON line (last line):
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": R}
"""
from __future__ import annotations

import functools
import json
import os
import subprocess
import sys
import tempfile
import time

MESH_NX = MESH_NY = 512
FEAT = 128
ITERS_SHORT, ITERS_LONG = 4, 24
RAND_NODES = 1 << 18
RAND_DEG = 16
TOTAL_TIMEOUT_S = int(os.environ.get("NGPDE_BENCH_TIMEOUT", "1700"))


def _worker(outfile: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from neuralgraphpde.graph.builders import grid_graph_2d
    from neuralgraphpde.kernels.banded_kernels import _banded_spmm_fwd
    from neuralgraphpde.kernels.segment_kernels import (
        _tiled_segment_spmm_fwd, build_tiled_csr,
    )
    from neuralgraphpde.ops.bsr import build_banded

    def emit(line: str) -> None:
        with open(outfile, "a") as f:
            f.write(line + "\n")

    rng = np.random.default_rng(0)
    w = jnp.asarray(
        (rng.normal(size=(FEAT, FEAT)) / np.sqrt(FEAT)).astype(np.float32))

    def sync(v):
        return float(jnp.sum(v[0, :8]))

    def run_paths(tag, E, c, x, paths):
        for name, spmm in paths:
            try:
                @functools.partial(jax.jit, static_argnums=(1,))
                def loop(x0, iters, spmm=spmm):
                    def rhs(v):
                        h = v * c[:, None]
                        h = spmm(h)
                        h = h * c[:, None]
                        h = jnp.dot(h, w, preferred_element_type=h.dtype)
                        return jnp.tanh(h)

                    return jax.lax.fori_loop(0, iters, lambda i, v: rhs(v),
                                             x0)

                sync(loop(x, ITERS_SHORT))
                sync(loop(x, ITERS_LONG))
                t0 = time.perf_counter()
                sync(loop(x, ITERS_SHORT))
                t_short = time.perf_counter() - t0
                t0 = time.perf_counter()
                sync(loop(x, ITERS_LONG))
                t_long = time.perf_counter() - t0
                dt = max(t_long - t_short, 1e-9) / (ITERS_LONG - ITERS_SHORT)
                emit(f"RESULT {tag} {name} {E / dt}")
            except Exception as err:  # keep going: later paths may work
                emit(f"FAIL {tag} {name} {type(err).__name__}")

    # ---------------- primary: 512x512 8-neighborhood PDE mesh ----------
    g = grid_graph_2d(MESH_NX, MESH_NY, diagonals=True)
    sg, rg = np.asarray(g.senders), np.asarray(g.receivers)
    ng, Eg = g.num_nodes, g.num_edges
    deg = np.bincount(rg, minlength=ng).astype(np.float32)
    c = jnp.asarray((1.0 / np.sqrt(np.maximum(deg, 1.0))).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(ng, FEAT)).astype(np.float32))
    senders_d, receivers_d = g.senders, g.receivers

    def xla_mesh(h):
        xj = jnp.take(h, senders_d, axis=0)
        return jax.ops.segment_sum(xj, receivers_d, num_segments=ng,
                                   indices_are_sorted=True)

    emit(f"INFO mesh {MESH_NX}x{MESH_NY} diag: n={ng} E={Eg}")
    tcsr_g = build_tiled_csr(sg, rg, ng)
    bm32 = build_banded(sg, rg, ng, tb=256)
    bm16 = build_banded(sg, rg, ng, tb=256, dtype=jnp.bfloat16)
    emit(f"INFO bands offsets={None if bm32 is None else bm32.offsets}")

    mesh_paths = [
        ("xla", xla_mesh),
        ("tcsr_bf16", lambda h: _tiled_segment_spmm_fwd(
            tcsr_g, h, compute_dtype=jnp.bfloat16)[:ng]),
    ]
    if bm32 is not None:
        mesh_paths.append(("banded_f32",
                           lambda h: _banded_spmm_fwd(bm32, h)))
    if bm16 is not None:
        mesh_paths.append(("banded_bf16",
                           lambda h: _banded_spmm_fwd(bm16, h)))
    run_paths("mesh", Eg, c, x, mesh_paths)

    # ---------------- secondary: random graph (gather-path regression) --
    try:
        E2 = RAND_NODES * RAND_DEG
        s2 = rng.integers(0, RAND_NODES, E2, dtype=np.int64).astype(np.int32)
        r2 = np.sort(
            rng.integers(0, RAND_NODES, E2, dtype=np.int64)).astype(np.int32)
        deg2 = np.bincount(r2, minlength=RAND_NODES).astype(np.float32)
        c2 = jnp.asarray(
            (1.0 / np.sqrt(np.maximum(deg2, 1.0))).astype(np.float32))
        x2 = jnp.asarray(
            rng.normal(size=(RAND_NODES, FEAT)).astype(np.float32))
        tcsr2 = build_tiled_csr(s2, r2, RAND_NODES)
        s2_d, r2_d = jnp.asarray(s2), jnp.asarray(r2)

        def xla_rand(h):
            xj = jnp.take(h, s2_d, axis=0)
            return jax.ops.segment_sum(xj, r2_d, num_segments=RAND_NODES,
                                       indices_are_sorted=True)

        run_paths("rand", E2, c2, x2, [
            ("xla", xla_rand),
            ("tcsr_bf16", lambda h: _tiled_segment_spmm_fwd(
                tcsr2, h, compute_dtype=jnp.bfloat16)[:RAND_NODES]),
        ])
    except Exception as err:
        emit(f"FAIL rand setup {type(err).__name__}")


def main():
    if "--worker" in sys.argv:
        _worker(sys.argv[sys.argv.index("--worker") + 1])
        return

    outfile = tempfile.mktemp(prefix="ngpde_bench_")
    open(outfile, "w").close()
    try:
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", outfile],
            timeout=TOTAL_TIMEOUT_S, capture_output=True)
    except subprocess.TimeoutExpired:
        print("# worker hit overall timeout; using partial results",
              flush=True)

    mesh, rand = {}, {}
    with open(outfile) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "RESULT":
                (mesh if parts[1] == "mesh" else rand)[parts[2]] = \
                    float(parts[3])
            elif parts[0] == "FAIL":
                print(f"# {parts[1]}/{parts[2]} failed: {parts[-1]}",
                      flush=True)
            elif parts[0] == "INFO":
                print("# " + " ".join(parts[1:]), flush=True)
    os.unlink(outfile)

    for tag, res in (("mesh", mesh), ("rand", rand)):
        for name, eps in sorted(res.items()):
            print(f"# {tag}/{name}: {eps / 1e6:.1f} M edges/s", flush=True)

    base_eps = mesh.get("xla", 0.0)
    best_eps = max((v for k, v in mesh.items() if k != "xla"), default=0.0)
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
