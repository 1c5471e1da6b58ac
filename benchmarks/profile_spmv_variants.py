"""SpMV variant A/B on the real chip: generic pull vs fused 7-kernel chain.

Replay-amortized protocol (same as profile_spmv_bfs.py): per-iteration ms
is (time of R in-jit iterations - time of 1) / (R-1). Run alone — the axon
TPU runtime is single-client.

Usage: python benchmarks/profile_spmv_variants.py [scale=20] [ef=30]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

R = 16


def bench(name, make_fn, init_x, g, n_bytes_model=None, cycles=3):
    @partial(jax.jit, static_argnums=(2,))
    def replay(g, x, n):
        def body(i, x):
            return make_fn(g, x, i)
        out = jax.lax.fori_loop(0, n, body, x)
        return sum(jnp.sum(jnp.asarray(o, jnp.float32).ravel()[:8])
                   for o in jax.tree_util.tree_leaves(out))

    def fetch(n):
        t = time.perf_counter()
        float(replay(g, init_x, n))
        return time.perf_counter() - t

    t0 = time.perf_counter()
    fetch(1)
    compile_s = time.perf_counter() - t0
    fetch(R)
    best = float("inf")
    for _ in range(cycles):
        d1 = fetch(1)
        dR = fetch(R)
        best = min(best, max((dR - d1) / (R - 1), 1e-9))
    ms = best * 1e3
    extra = ""
    if n_bytes_model:
        extra = f"  ({n_bytes_model / best / 1e9:7.1f} GB/s-model)"
    print(f"{name:34s} {ms:9.3f} ms{extra}   [compile {compile_s:.0f}s]",
          flush=True)
    return ms


def main():
    from essentials_tpu.formats import Csr
    from essentials_tpu.graph import build_graph
    from essentials_tpu.io import generate
    from essentials_tpu.algorithms import spmv

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    ef = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    t0 = time.perf_counter()
    coo = generate.rmat(scale, ef, seed=3, undirected=False, weighted=True)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=True, weighted=True)
    ep = g.n_edges_padded
    e = g.n_edges
    print(f"built: V={g.n_vertices} E={e} Ep={ep} fused_supported="
          f"{spmv.fused_supported(g)} ({time.perf_counter() - t0:.0f}s)",
          flush=True)
    x0 = jax.random.uniform(jax.random.PRNGKey(0),
                            (g.n_vertices_padded,), jnp.float32)

    # host parity check of the fused chain at this scale (once)
    y_f = np.asarray(spmv.spmv_fused(g, x0))[:min(g.n_vertices, 1 << 18)]
    y_p = np.asarray(spmv.spmv_pull(g, x0))[:y_f.shape[0]]
    err = np.max(np.abs(y_f - y_p) / np.maximum(np.abs(y_p), 1e-3))
    print(f"fused vs pull max-rel-err (first {y_f.shape[0]}): {err:.2e}",
          flush=True)

    sol_bytes = e * 12.0        # val + colidx + x-gather: the roofline model
    print(f"speed-of-light @12B/edge: {sol_bytes / 819e9 * 1e3:.3f} ms",
          flush=True)

    def keep(y, x):
        return x + y[:x.shape[0]] * 1e-9

    ms_f = bench("spmv_fused (7k chain)",
                 lambda g, x, i: keep(spmv.spmv_fused(g, x), x),
                 x0, g, n_bytes_model=ep * 4 * 14)
    ms_p = bench("spmv_pull (generic)",
                 lambda g, x, i: keep(spmv.spmv_pull(g, x), x),
                 x0, g, n_bytes_model=ep * 4 * 14)
    for name, ms in [("fused", ms_f), ("pull", ms_p)]:
        print(f"{name}: {ms:.3f} ms  -> pct_hbm_roofline="
              f"{sol_bytes / 819e9 * 1e3 / ms:.3f}", flush=True)




def bench_windowed(scale=20, ef=30):
    """A/B the windowed 3-kernel SpMV vs the 7-kernel chain at scale."""
    import jax
    import jax.numpy as jnp
    from essentials_tpu.formats import Csr
    from essentials_tpu.graph import build_graph
    from essentials_tpu.io import generate
    from essentials_tpu.algorithms import spmv
    from essentials_tpu.ops import windowed_spmv as W

    t0 = time.perf_counter()
    coo = generate.rmat(scale, ef, seed=3, undirected=False, weighted=True)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=True, weighted=True)
    print(f"built ({time.perf_counter() - t0:.0f}s)", flush=True)
    t0 = time.perf_counter()
    plan = W.build_windowed_plan(g)
    print(f"windowed plan: {'OK' if plan else 'UNSUPPORTED'} "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)
    if plan is None:
        return
    x0 = jax.random.uniform(jax.random.PRNGKey(0),
                            (g.n_vertices_padded,), jnp.float32)
    fw = jax.jit(W.spmv_windowed)
    yw = np.asarray(fw(g, plan, x0))
    yp = np.asarray(spmv.spmv_pull(g, x0))[:yw.shape[0]]
    err = np.max(np.abs(yw - yp) / np.maximum(np.abs(yp), 1e-3))
    print(f"windowed vs pull max-rel-err: {err:.2e}", flush=True)
    e = g.n_edges
    sol_ms = e * 12.0 / 819e9 * 1e3

    def keep(y, x):
        return x + y[:x.shape[0]] * 1e-9

    # plan must ride as a jit ARGUMENT (closed-over stage arrays become
    # program constants -> remote-compile HTTP 413)
    from functools import partial as _partial

    @_partial(jax.jit, static_argnums=(3,))
    def replay_w(g, plan, x, n):
        def body(i, x):
            return keep(W.spmv_windowed(g, plan, x), x)
        return jnp.sum(jax.lax.fori_loop(0, n, body, x).ravel()[:8])

    def fetch_w(n):
        t = time.perf_counter()
        float(replay_w(g, plan, x0, n))
        return time.perf_counter() - t

    R_ = 16
    fetch_w(1); fetch_w(R_)
    ms_w = min(max((fetch_w(R_) - fetch_w(1)) / (R_ - 1), 1e-9)
               for _ in range(3)) * 1e3
    print(f"{'spmv_windowed (3k)':34s} {ms_w:9.3f} ms", flush=True)
    ms_f = bench("spmv_fused (7k chain)",
                 lambda g, x, i: keep(spmv.spmv_fused(g, x), x),
                 x0, g, n_bytes_model=g.n_edges_padded * 4 * 14)
    for name, ms in [("windowed", ms_w), ("fused", ms_f)]:
        print(f"{name}: {ms:.3f} ms -> pct_hbm_roofline="
              f"{sol_ms / ms:.3f}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[3] == "win":
        bench_windowed(int(sys.argv[1]), int(sys.argv[2]))
    else:
        main()
