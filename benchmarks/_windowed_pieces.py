"""Piece attribution of the windowed SpMV at rmat20: time cumulative
prefixes of the pipeline (x-prep / 3 kernels / DUS merge / y-route)
with output-feedback replay. Uses the factored round-5 API."""

import time
from functools import partial
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

R = 12


def main():
    from benchmarks.run_benchmarks import _load
    from essentials_tpu.graph import build_graph
    from essentials_tpu import algorithms as A
    from essentials_tpu.ops import windowed_spmv as W
    from essentials_tpu.ops.permute import apply_plan

    spec = sys.argv[1] if len(sys.argv) > 1 else "gen:rmat20x16"
    csr, ds = _load(spec)
    g = build_graph(csr, directed=False, weighted=True)
    plan = A.pr.spmv_plan(g)
    assert plan is not None
    print(f"{ds}: G={plan.G} n_cseg={plan.n_cseg} n_rseg={plan.n_rseg}",
          flush=True)

    def pipeline(plan, x, stage):
        x = x.astype(jnp.float32)
        xc = apply_plan(x, plan.xc_route)
        dxc2 = W.compact_bits(plan, xc)
        if stage == 0:
            return dxc2.ravel()[:g.n_vertices_padded]
        priv = W.windowed_pipeline(g, plan, dxc2)
        if stage == 1:
            return jax.lax.bitcast_convert_type(
                priv, jnp.float32).ravel()[:g.n_vertices_padded]
        yc = jax.lax.bitcast_convert_type(W.merge_compact(plan, priv),
                                          jnp.float32)
        if stage == 2:
            return yc[:g.n_vertices_padded]
        y = apply_plan(yc, plan.y_route)
        return jnp.where(plan.y_mask, y, 0.0)[:g.n_vertices_padded]

    x0 = jnp.where(g.vertex_mask(),
                   jax.random.uniform(jax.random.PRNGKey(0),
                                      (g.n_vertices_padded,), jnp.float32),
                   0.0)

    # plan rides as a jit ARGUMENT (closing over it bakes the stage
    # arrays as constants -> HTTP 413 on remote-compile upload)
    @partial(jax.jit, static_argnums=(3, 4))
    def replay(g, plan, x, n, stage):
        def body(i, x):
            y = pipeline(plan, x, stage)
            if y.shape[0] < x.shape[0]:
                y = jnp.pad(y, (0, x.shape[0] - y.shape[0]))
            return x * 0.5 + y[:x.shape[0]] * 1e-9
        return jnp.sum(jax.lax.fori_loop(0, n, body, x).ravel()[:8])

    def fetch(n, stage):
        t = time.perf_counter()
        float(replay(g, plan, x0, n, stage))
        return time.perf_counter() - t

    names = ["x-prep", "+3kernels", "+DUSmerge", "+y-route"]
    prev = 0.0
    for stage in range(4):
        fetch(1, stage)
        fetch(R, stage)
        best = min(max((fetch(R, stage) - fetch(1, stage)) / (R - 1), 1e-9)
                   for _ in range(3)) * 1e3
        print(f"{names[stage]:10s}: {best:7.3f} ms  (+{best - prev:6.3f})",
              flush=True)
        prev = best


if __name__ == "__main__":
    main()
