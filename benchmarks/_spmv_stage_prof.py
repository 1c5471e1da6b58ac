"""Per-kernel attribution of the fused SpMV chain at rmat20 (tfbc):
time chain prefixes stop_after=1..7; diffs = per-kernel cost."""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

R = 12


def main():
    from essentials_tpu.formats import Csr
    from essentials_tpu.graph import build_graph
    from essentials_tpu.io import generate
    from essentials_tpu.ops.fused_spmv import _pallas_spmv_chain
    from essentials_tpu.ops.segment import _run_totals

    t0 = time.perf_counter()
    coo = generate.rmat(20, 30, seed=3, undirected=False, weighted=True)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=True, weighted=True)
    print(f"built ({time.perf_counter() - t0:.0f}s)", flush=True)

    route_a, plan_b, route_c = g.off_route_csc, g.route_bwd, g.off_route_csr
    plan_a, plan_c = route_a.plan, route_c.inv_plan
    L = plan_a.length
    ep = g.n_edges_padded
    n_seg = route_c.n_seg

    x0 = jax.random.uniform(jax.random.PRNGKey(0),
                            (g.n_vertices_padded,), jnp.float32)

    @partial(jax.jit, static_argnums=(2, 3))
    def replay(g, x, n, stop):
        w = g.csc_values.astype(jnp.float32)
        w = jnp.pad(jnp.where(jnp.arange(ep) < g.n_edges, w, 0.0),
                    (0, L - ep))
        flags = jnp.pad(g.csr_seg_flags.astype(jnp.int8), (0, L - ep),
                        constant_values=1)

        def body(i, x):
            iv = jax.lax.bitcast_convert_type(x, jnp.int32)
            d = jnp.diff(iv, prepend=jnp.zeros(1, jnp.int32))
            dd0 = _run_totals(d, route_a)
            dd = jnp.pad(dd0, (0, L - dd0.shape[0]))
            out = _pallas_spmv_chain(dd, w, flags, plan_a, plan_b, plan_c,
                                     n_seg, stop_after=stop)
            return x + out[:x.shape[0]] * 1e-9
        return jnp.sum(jax.lax.fori_loop(0, n, body, x).ravel()[:8])

    def fetch(n, stop):
        t = time.perf_counter()
        float(replay(g, x0, n, stop))
        return time.perf_counter() - t

    prev = 0.0
    for stop in range(1, 8):
        fetch(1, stop)
        fetch(R, stop)
        best = min(max((fetch(R, stop) - fetch(1, stop)) / (R - 1), 1e-9)
                   for _ in range(3)) * 1e3
        print(f"prefix k1..k{stop}: {best:7.3f} ms  (+{best - prev:6.3f})",
              flush=True)
        prev = best


if __name__ == "__main__":
    main()
