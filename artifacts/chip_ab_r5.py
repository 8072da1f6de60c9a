"""Round-5 on-chip A/B: DIA stencil-body variants + fused-backward memory.

Run AFTER the VMH protocol run frees the chip (timing on a contended relay
is meaningless — the r4 lesson). Emits plain lines; the winner feeds the
NGPDE_DIA_VARIANT default and ROADMAP/PARITY text.

  python artifacts/chip_ab_r5.py dia     # variant sweep on the bench mesh
  python artifacts/chip_ab_r5.py mem     # fused-bwd peak-HBM vs xla @1M edges
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS_SHORT, ITERS_LONG = 8, 104
REPEATS = 3


def _time_loop(loop, x0, struct):
    sync = lambda v: float(jnp.sum(v[0, :8]))
    short, long_ = jnp.int32(ITERS_SHORT), jnp.int32(ITERS_LONG)
    sync(loop(x0, short, struct))
    sync(loop(x0, long_, struct))
    rates = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        sync(loop(x0, short, struct))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(loop(x0, long_, struct))
        t_l = time.perf_counter() - t0
        rates.append(max(t_l - t_s, 1e-9) / (ITERS_LONG - ITERS_SHORT))
    rates.sort()
    return rates[len(rates) // 2], rates[0], rates[-1]


def dia_ab():
    from neuralgraphpde.graph.builders import grid_graph_2d
    from neuralgraphpde.kernels.dia_kernels import _dia_rhs_fwd
    from neuralgraphpde.ops.dia import build_dia

    g = grid_graph_2d(512, 512, diagonals=True)
    s_np, r_np = np.asarray(g.senders), np.asarray(g.receivers)
    n, E = g.num_nodes, g.num_edges
    rng = np.random.default_rng(0)
    w = jnp.asarray((rng.normal(size=(128, 128)) / np.sqrt(128))
                    .astype(np.float32))
    deg = np.bincount(r_np, minlength=n).astype(np.float64)
    c = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-30)), 0.0)
    vals = (c[r_np] * c[s_np]).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))
    print(f"mesh 512x512 diag: n={n} E={E}")

    for dtype, tag in ((jnp.bfloat16, "bf16"), (np.float32, "f32")):
        dm = build_dia(s_np, r_np, n, edge_weight=vals, dtype=dtype)
        od = jnp.bfloat16 if dtype == jnp.bfloat16 else None
        x_run = x.astype(jnp.bfloat16) if dtype == jnp.bfloat16 else x

        for variant in ("concat32", "phase", "store", "phase_store"):
            os.environ["NGPDE_DIA_VARIANT"] = variant
            jax.clear_caches()

            @jax.jit
            def loop(x0, iters, dmv, od=od):
                def rhs(v):
                    return _dia_rhs_fwd(dmv, v, w, None, act="tanh",
                                        out_dtype=od)
                return jax.lax.fori_loop(0, iters, lambda i, v: rhs(v), x0)

            try:
                med, lo, hi = _time_loop(loop, x_run, dm)
                print(f"dia_{tag}/{variant}: {E / med / 1e6:.1f} M edges/s "
                      f"(spread {E / hi / 1e6:.1f}-{E / lo / 1e6:.1f})",
                      flush=True)
            except Exception as err:
                print(f"dia_{tag}/{variant}: FAIL {type(err).__name__}: "
                      f"{str(err)[:140]}", flush=True)
    os.environ.pop("NGPDE_DIA_VARIANT", None)


def mem_ab():
    """Peak-HBM for the differentiated fused edge-MLP: saved-activation XLA
    backend vs the fully-fused Pallas pair, >=1M edges (VERDICT r4 #5)."""
    from neuralgraphpde.kernels.fused_mlp_kernels import fused_mlp_aggregate
    from neuralgraphpde.kernels.segment_kernels import build_tiled_csr

    n, E, fin = 131072, 1_048_576, 8
    widths = (fin, 64, 64, 64, 40)
    acts = ("tanh", "tanh", "tanh", None)
    rng = np.random.default_rng(0)
    r = np.sort(rng.integers(0, n, E).astype(np.int64))
    tcsr = build_tiled_csr(np.arange(E), r, n)
    feats = jnp.asarray(rng.normal(size=(E, fin)).astype(np.float32))
    ws = tuple(jnp.asarray((rng.normal(size=(a, b)) / np.sqrt(a))
                           .astype(np.float32))
               for a, b in zip(widths, widths[1:]))
    bs = tuple(jnp.asarray((rng.normal(size=(1, b)) * 0.1)
                           .astype(np.float32)) for b in widths[1:])
    sigma = sum(widths[1:])
    print(f"mem A/B: E={E} widths={widths} "
          f"(saved-activation estimate ~2*E*{sigma}*4B = "
          f"{2 * E * sigma * 4 / 1e9:.2f} GB)")

    def loss(f, ws, bs):
        return jnp.sum(fused_mlp_aggregate(acts, f, ws, bs, tcsr)[:n] ** 2)

    # peak_bytes_in_use is cumulative per PROCESS — each backend must be
    # measured in its own process (run `mem xla` and `mem pallas`)
    mode = sys.argv[2] if len(sys.argv) > 2 else "xla"
    os.environ["NGPDE_FUSED_BWD"] = mode
    dev = jax.local_devices()[0]
    base = (dev.memory_stats() or {}).get("peak_bytes_in_use", 0)
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(feats, ws, bs)
    jax.block_until_ready(jax.tree_util.tree_leaves(g)[0])
    stats = dev.memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", stats.get("peak_bytes", 0))
    print(f"fused_bwd={mode}: peak_bytes_in_use={peak / 1e9:.3f} GB "
          f"(pre-grad baseline {base / 1e9:.3f} GB; keys: "
          f"{sorted(k for k in stats if 'peak' in k)})", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "dia"
    (dia_ab if which == "dia" else mem_ab)()
