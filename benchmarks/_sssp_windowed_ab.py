"""A/B: windowed compact-space SSSP vs the edge-axis fused sweeps
(replay timing + exact-distance cross-check on chip)."""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from benchmarks.run_benchmarks import _load
from essentials_tpu.graph import build_graph
from essentials_tpu.algorithms import sssp
from essentials_tpu import algorithms as A
from essentials_tpu.ops.fused_sssp import run_fused_sssp
from essentials_tpu.ops.windowed_sssp import run_windowed_sssp

R = 4

for spec in (sys.argv[1:] or ["gen:rmat20x16"]):
    csr, ds = _load(spec)
    g = build_graph(csr, directed=False, weighted=True)
    plan = A.pr.spmv_plan(g)
    print(f"{ds}: plan {'OK' if plan is not None else 'NONE'}", flush=True)
    deg = np.diff(np.asarray(csr.row_offsets))
    sources = np.argsort(-deg)[:8].astype(np.int32)
    max_it = g.n_vertices + 1

    # exactness cross-check (single dispatch each)
    dw, itw = jax.jit(run_windowed_sssp, static_argnums=(3,))(
        g, plan, int(sources[0]), max_it)
    df, itf = jax.jit(run_fused_sssp, static_argnums=(2,))(
        g, int(sources[0]), max_it)
    n = g.n_vertices
    same = bool(jnp.all(dw[:n] == df[:n]))
    print(f"  exact match vs fused: {same}  it w/f = {int(itw)}/{int(itf)}",
          flush=True)
    assert same

    srcs = jnp.asarray(sources)

    @partial(jax.jit, static_argnums=(3,))
    def replay_w(g, plan, srcs, R):
        def one(i, carry):
            acc, _ = carry
            dist, it = run_windowed_sssp(g, plan, srcs[i % 8], max_it)
            return acc + jnp.sum(dist[:64]) + it, it
        return jax.lax.fori_loop(0, R, one,
                                 (jnp.float32(0), jnp.int32(0)))

    @partial(jax.jit, static_argnums=(2,))
    def replay_f(g, srcs, R):
        def one(i, carry):
            acc, _ = carry
            dist, it = run_fused_sssp(g, srcs[i % 8], max_it)
            return acc + jnp.sum(dist[:64]) + it, it
        return jax.lax.fori_loop(0, R, one,
                                 (jnp.float32(0), jnp.int32(0)))

    for name, rep in (("windowed", lambda n: replay_w(g, plan, srcs, n)),
                      ("fused", lambda n: replay_f(g, srcs, n))):
        float(rep(1)[0]); float(rep(R)[0])
        cyc = []
        for _ in range(3):
            t0 = time.perf_counter(); float(rep(1)[0])
            t1 = (time.perf_counter() - t0) * 1e3
            t0 = time.perf_counter(); acc, it = rep(R); float(acc)
            tR = (time.perf_counter() - t0) * 1e3
            cyc.append((tR - t1) / (R - 1))
        print(f"  sssp_{name:9s} {float(np.median(cyc)):8.2f} ms/run "
              f"iters={int(it)}  {[round(c,2) for c in cyc]}", flush=True)
