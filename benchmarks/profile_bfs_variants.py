"""Whole-BFS timing under the bench protocol for step variants.

Isolates the adaptive-machinery cost: dense-only steps vs the full
spray/dense adaptive step vs spray-budget variants.
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

RUNS = 16


def bench_whole(step_init, g, sources, max_it=64, cycles=5):
    init, step = step_init

    @partial(jax.jit, static_argnums=(2,))
    def replay(g, sources, R):
        def one(i, carry):
            acc, _ = carry
            st = init(g, sources[i % RUNS])

            def cond(c):
                return (c[1] < max_it) & jnp.any(c[0][1])

            def body(c):
                return step(g, c[0], c[1]), c[1] + 1
            st, it = jax.lax.while_loop(
                cond, body, (st, jnp.asarray(0, jnp.int32)))
            return acc + jnp.sum(st[0] % 97) + it, it
        return jax.lax.fori_loop(
            0, R, one, (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)))

    def timed(R):
        t0 = time.perf_counter()
        acc, it = replay(g, sources, R)
        _ = int(acc)
        return (time.perf_counter() - t0) * 1e3

    timed(1); timed(RUNS)
    best = float("inf")
    for _ in range(cycles):
        t1, tR = timed(1), timed(RUNS)
        best = min(best, max((tR - t1) / (RUNS - 1), 1e-6))
    return best


def main():
    from essentials_tpu.formats import Csr
    from essentials_tpu.graph import build_graph
    from essentials_tpu.io import generate
    from essentials_tpu.algorithms import bfs
    from essentials_tpu.ops import advance_count

    coo = generate.rmat(18, 16, seed=1, undirected=True, weighted=False)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=False)
    vp = g.n_vertices_padded
    sources = jnp.asarray(
        np.argsort(-np.diff(np.asarray(csr.row_offsets)))[:RUNS]
        .astype(np.int32))
    UNREACHED = bfs.UNREACHED

    # ---- dense-only: state = (dist, frontier) ----
    def d_init(g, s):
        dist = jnp.full(vp, UNREACHED, jnp.int32).at[s].set(0)
        f = jnp.zeros(vp, jnp.bool_).at[s].set(True)
        return (dist, f)

    def d_step(g, st, it):
        dist, f = st
        newly = (advance_count(g, f) > 0) & (dist == UNREACHED)
        return (jnp.where(newly, it + 1, dist), newly)

    t_dense = bench_whole((d_init, d_step), g, sources)
    E = g.n_edges
    print(f"dense-only:  {t_dense:7.3f} ms  "
          f"({E / 1e6 / (t_dense / 1e3):7.0f} MTEPS)")

    # ---- full adaptive (current bfs.step), repacked as tuple state ----
    def a_init(g, s):
        st = bfs.init(g, s)
        return (st.distances, st.frontier, st.fidx, st.fcount, st.fvalid)

    def a_step(g, st, it):
        ns = bfs.step(g, bfs.BfsState(*st), it)
        return (ns.distances, ns.frontier, ns.fidx, ns.fcount, ns.fvalid)

    t_adapt = bench_whole((a_init, a_step), g, sources)
    print(f"adaptive:    {t_adapt:7.3f} ms  "
          f"({E / 1e6 / (t_adapt / 1e3):7.0f} MTEPS)")


if __name__ == "__main__":
    main()
