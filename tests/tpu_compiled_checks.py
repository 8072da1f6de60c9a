"""Compiled-TPU kernel verification (VERDICT r1 item 5).

Runs every Pallas kernel COMPILED on the real chip (not interpret mode) and
checks numerics + gradients against the XLA reference, then times the mesh
SpMM paths. Standalone script (the pytest conftest pins the CPU backend):

    python tests/tpu_compiled_checks.py

Tunnel quirks handled (docs/tpu_design.md): every comparison jit takes
device *buffers* as arguments — combining two large programs in one jit
overflows the relay's remote-compile request (HTTP 413) — and syncs are
scalar reads only.
"""
import sys
import time

import jax

# NB: do NOT enable the persistent compilation cache here — cache hits ship
# the serialized executable through the tunnel relay, which hangs or 413s
# (docs/tpu_design.md, measured r2).

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

FAILURES = []


def check(name, got, want, tol):
    d = float(jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(got, want))
    scale = float(jax.jit(lambda b: jnp.max(jnp.abs(b)))(want)) + 1e-30
    rel = d / scale
    status = "ok" if rel < tol else "FAIL"
    if rel >= tol:
        FAILURES.append(name)
    print(f"{name}: max|diff|={d:.3e} rel={rel:.3e} [{status}]", flush=True)


def main():
    assert jax.default_backend() == "tpu", (
        f"needs the TPU backend, got {jax.default_backend()}")
    print("device:", jax.devices()[0], flush=True)

    from neuralgraphpde.graph.builders import grid_graph_2d
    from neuralgraphpde.kernels.banded_kernels import (
        _banded_spmm_fwd, banded_spmm_pallas,
    )
    from neuralgraphpde.kernels.segment_kernels import (
        _tiled_segment_spmm_fwd, build_tiled_csr, tiled_segment_spmm,
    )
    from neuralgraphpde.ops.bsr import build_banded

    rng = np.random.default_rng(0)

    # ---------------- tiled-CSR segment SpMM (random graph) ----------------
    n, e, F = 4096, 32768, 128
    s = rng.integers(0, n, e).astype(np.int64)
    r = np.sort(rng.integers(0, n, e)).astype(np.int64)
    x = jnp.asarray(rng.normal(size=(n, F)).astype(np.float32))
    tcsr = build_tiled_csr(s, r, n)
    tcsr_rev = build_tiled_csr(r, s, n)
    senders = jnp.asarray(s.astype(np.int32))
    receivers = jnp.asarray(r.astype(np.int32))

    @jax.jit
    def xla_spmm(v):
        return jax.ops.segment_sum(jnp.take(v, senders, axis=0), receivers,
                                   num_segments=n, indices_are_sorted=True)

    y_ref = xla_spmm(x)
    y_pal = jax.jit(lambda v: tiled_segment_spmm(v, tcsr, tcsr_rev)[:n])(x)
    check("tiled_csr_f32_fwd", y_pal, y_ref, 1e-5)
    y_b16 = jax.jit(lambda v: _tiled_segment_spmm_fwd(
        tcsr, v, compute_dtype=jnp.bfloat16)[:n])(x)
    check("tiled_csr_bf16_fwd", y_b16, y_ref, 2e-2)

    g_pal = jax.jit(jax.grad(
        lambda v: jnp.sum(tiled_segment_spmm(v, tcsr, tcsr_rev)[:n] ** 2)))(x)
    g_ref = jax.jit(jax.grad(lambda v: jnp.sum(xla_spmm(v) ** 2)))(x)
    check("tiled_csr_f32_grad", g_pal, g_ref, 1e-4)

    # ---------------- banded kernel (512x512 grid mesh) ----------------
    g = grid_graph_2d(512, 512)
    sg, rg = np.asarray(g.senders), np.asarray(g.receivers)
    ng, Eg = g.num_nodes, g.num_edges
    t0 = time.time()
    bm = build_banded(sg, rg, ng, tb=256)
    bm16 = build_banded(sg, rg, ng, tb=256, dtype=jnp.bfloat16)
    bm_rev = build_banded(rg, sg, ng, tb=256)
    print(f"build_banded x3 (on-device scatter): {time.time()-t0:.1f}s",
          flush=True)
    xg = jnp.asarray(rng.normal(size=(ng, F)).astype(np.float32))
    sg_d, rg_d = g.senders, g.receivers

    @jax.jit
    def xla_mesh(v):
        return jax.ops.segment_sum(jnp.take(v, sg_d, axis=0), rg_d,
                                   num_segments=ng, indices_are_sorted=True)

    yg_ref = xla_mesh(xg)
    yg_f32 = jax.jit(lambda v: _banded_spmm_fwd(bm, v))(xg)
    check("banded_f32_fwd", yg_f32, yg_ref, 1e-5)
    yg_b16 = jax.jit(lambda v: _banded_spmm_fwd(bm16, v))(xg)
    check("banded_bf16_fwd", yg_b16, yg_ref, 2e-2)

    gg_pal = jax.jit(jax.grad(
        lambda v: jnp.sum(banded_spmm_pallas(v, bm, bm_rev) ** 2)))(xg)
    gg_ref = jax.jit(jax.grad(lambda v: jnp.sum(xla_mesh(v) ** 2)))(xg)
    check("banded_f32_grad", gg_pal, gg_ref, 1e-4)

    # ---------------- segment max (segmented-scan kernel) ----------------
    from neuralgraphpde.kernels.segment_kernels import _tiled_segment_max_fwd

    tcsr_e = build_tiled_csr(np.arange(e), r, n)
    msgs = jnp.asarray(rng.normal(size=(e, F)).astype(np.float32))
    r_d = jnp.asarray(r.astype(np.int32))
    y_max = jax.jit(lambda m: _tiled_segment_max_fwd(tcsr_e, m)[:n])(msgs)
    y_max_ref = jax.jit(lambda m: jax.ops.segment_max(
        m, r_d, num_segments=n, indices_are_sorted=True))(msgs)
    check("segment_max_fwd", y_max, y_max_ref, 1e-6)

    # ---------------- fused GNO kernel ----------------
    from neuralgraphpde.kernels.gno_kernels import (
        _fused_gno_fwd, pack_last_layer,
    )

    ci, co, hid = 32, 32, 64
    n2, e2 = 1024, 8192
    s2 = rng.integers(0, n2, e2).astype(np.int64)
    r2 = np.sort(rng.integers(0, n2, e2)).astype(np.int64)
    tcsr2 = build_tiled_csr(np.arange(e2), r2, n2)
    h = jnp.asarray(rng.normal(size=(n2, ci)).astype(np.float32))
    act = jnp.asarray(rng.normal(size=(e2, hid)).astype(np.float32))
    W = jnp.asarray((rng.normal(size=(hid, ci * co)) / np.sqrt(hid))
                    .astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1, ci * co)).astype(np.float32) * 0.1)
    s2_d = jnp.asarray(s2.astype(np.int32))
    r2_d = jnp.asarray(r2.astype(np.int32))
    wl, bl = pack_last_layer(W, b, ci, co)

    @jax.jit
    def gno_ref(act, h):
        # row-major reshape semantics: flat[i*out + o] = K[i, o]
        kmat = (jnp.dot(act, W) + b).reshape(e2, ci, co)
        hj = jnp.take(h, s2_d, axis=0)
        m = jnp.einsum("eio,ei->eo", kmat, hj)
        return jax.ops.segment_sum(m, r2_d, num_segments=n2,
                                   indices_are_sorted=True)

    y_gno = jax.jit(lambda a, hh: _fused_gno_fwd(
        tcsr2, s2_d, a, hh, wl, bl)[:n2])(act, h)
    check("fused_gno_fwd", y_gno, gno_ref(act, h), 1e-4)

    # ---------------- timings: mesh SpMM inside the GCN ODE RHS ----------
    deg = np.bincount(rg, minlength=ng).astype(np.float32)
    c = jnp.asarray((1.0 / np.sqrt(np.maximum(deg, 1.0))).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(F, F)) / np.sqrt(F)).astype(np.float32))
    tcsr_g = build_tiled_csr(sg, rg, ng)

    def bench(name, spmm, iters=(4, 24)):
        import functools

        @functools.partial(jax.jit, static_argnums=(1,))
        def loop(x0, it):
            def rhs(v):
                h = v * c[:, None]
                h = spmm(h)
                h = h * c[:, None]
                h = jnp.dot(h, w, preferred_element_type=h.dtype)
                return jnp.tanh(h)

            return jax.lax.fori_loop(0, it, lambda i, v: rhs(v), x0)

        def sync(v):
            return float(jnp.sum(v[0, :8]))

        sync(loop(xg, iters[0])); sync(loop(xg, iters[1]))
        t0 = time.perf_counter(); sync(loop(xg, iters[0]))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter(); sync(loop(xg, iters[1]))
        tl = time.perf_counter() - t0
        dt = max(tl - ts, 1e-9) / (iters[1] - iters[0])
        print(f"bench {name}: {Eg/dt/1e6:.1f} M edges/s ({dt*1e3:.3f} ms/RHS)",
              flush=True)
        return Eg / dt

    r_xla = bench("xla      ", xla_mesh)
    r_tcsr = bench("tcsr_bf16", lambda v: _tiled_segment_spmm_fwd(
        tcsr_g, v, compute_dtype=jnp.bfloat16)[:ng])
    r_f32 = bench("banded_f32", lambda v: _banded_spmm_fwd(bm, v))
    r_b16 = bench("banded_bf16", lambda v: _banded_spmm_fwd(bm16, v))
    print(f"vs_xla: tcsr_bf16={r_tcsr/r_xla:.2f}x banded_f32={r_f32/r_xla:.2f}x"
          f" banded_bf16={r_b16/r_xla:.2f}x", flush=True)

    if FAILURES:
        print("FAILED:", FAILURES, flush=True)
        sys.exit(1)
    print("ALL COMPILED-TPU CHECKS PASSED", flush=True)


if __name__ == "__main__":
    main()
