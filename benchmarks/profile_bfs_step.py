"""Per-variant timing of bfs.step: spray step vs dense step vs empty step.

Separates the adaptive-machinery overhead from the superstep kernels
(round-2 perf work: bfs_step measured 2.1 ms avg vs 0.53 ms dense_reach).
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, arg, runs=16, cycles=3):
    @partial(jax.jit, static_argnums=(1,))
    def replay(a, R):
        def body(i, s):
            return fn(s)
        return jax.lax.fori_loop(0, R, body, a)

    def once(R):
        t0 = time.perf_counter()
        out = replay(arg, R)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        return (time.perf_counter() - t0) * 1e3

    once(1); once(runs)
    best = float("inf")
    for _ in range(cycles):
        t1 = once(1)
        tR = once(runs)
        best = min(best, max((tR - t1) / (runs - 1), 1e-6))
    return best


def main():
    from essentials_tpu.formats import Csr
    from essentials_tpu.graph import build_graph
    from essentials_tpu.io import generate
    from essentials_tpu.algorithms import bfs
    from essentials_tpu.ops.sparse_advance import (
        spray_k, SPRAY_BUDGET, frontier_out_degree, spray_reach,
        spray_candidates, spray_dedup, compact_frontier)

    coo = generate.rmat(18, 16, seed=1, undirected=True, weighted=False)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=False)
    vp = g.n_vertices_padded
    K = spray_k(g)
    print(f"V={g.n_vertices} E={g.n_edges} K={K} budget={SPRAY_BUDGET}")

    # states: hub source (spray step 0), big frontier dense, empty
    hub = int(np.argsort(-np.diff(np.asarray(csr.row_offsets)))[0])
    st0 = bfs.init(g, hub)                       # 1-vertex spray step

    # mid frontier: ~8K random vertices, fvalid=True (spray if degsum fits)
    rng = np.random.default_rng(0)
    mid = rng.choice(g.n_vertices, 2048, replace=False).astype(np.int32)
    fm = jnp.zeros(vp, jnp.bool_).at[jnp.asarray(mid)].set(True)
    fidx_m = jnp.full(K, g.pad_vertex, jnp.int32).at[:2048].set(
        jnp.asarray(np.sort(mid)))
    st_mid = bfs.BfsState(jnp.full(vp, bfs.UNREACHED, jnp.int32), fm,
                          fidx_m, jnp.int32(2048), jnp.asarray(True))

    # big frontier: half the graph, fvalid=False -> dense path
    fb = jnp.arange(vp) % 2 == 0
    st_big = bfs.BfsState(jnp.full(vp, bfs.UNREACHED, jnp.int32), fb,
                          jnp.full(K, g.pad_vertex, jnp.int32),
                          jnp.int32(0), jnp.asarray(False))
    # empty frontier
    st_emp = bfs.BfsState(jnp.zeros(vp, jnp.int32), jnp.zeros(vp, jnp.bool_),
                          jnp.full(K, g.pad_vertex, jnp.int32),
                          jnp.int32(0), jnp.asarray(True))

    def mk(st):
        def f(s):
            ns = bfs.step(g, s, jnp.int32(1))
            return bfs.BfsState(ns.distances, st.frontier, ns.fidx,
                                ns.fcount, st.fvalid)  # pin frontier/fvalid
        return f

    res = {}
    res["step_spray1"] = timeit(mk(st0), st0)
    res["step_spray2k"] = timeit(mk(st_mid), st_mid)
    res["step_dense"] = timeit(mk(st_big), st_big)
    res["step_empty"] = timeit(mk(st_emp), st_emp)

    # pieces of the spray path
    def outdeg(s):
        offs, deg = frontier_out_degree(g, s.fidx)
        return bfs.BfsState(s.distances.at[0].add(deg[0]), s.frontier,
                            s.fidx, s.fcount, s.fvalid)
    res["piece_outdeg"] = timeit(outdeg, st_mid)

    offs, deg = frontier_out_degree(g, st_mid.fidx)

    def spray(s):
        newly, nidx, nc = spray_reach(g, s.fidx, offs, deg,
                                      s.distances == bfs.UNREACHED,
                                      SPRAY_BUDGET, K)
        return bfs.BfsState(s.distances.at[0].add(nc), s.frontier, nidx,
                            nc, s.fvalid)
    res["piece_spray_reach"] = timeit(spray, st_mid)

    def cand(s):
        e, nb, _, valid = spray_candidates(g, s.fidx, offs, deg, SPRAY_BUDGET)
        return bfs.BfsState(s.distances.at[0].add(nb[0] + e[0]), s.frontier,
                            s.fidx, s.fcount, s.fvalid)
    res["piece_candidates"] = timeit(cand, st_mid)

    def compact(s):
        nidx = compact_frontier(s.frontier, K, g.pad_vertex)
        return bfsstate_with(s, nidx)

    def bfsstate_with(s, nidx):
        return bfs.BfsState(s.distances.at[0].add(nidx[0]), s.frontier,
                            nidx, s.fcount, s.fvalid)
    res["piece_compactV"] = timeit(compact, st_big)

    for k, v in res.items():
        print(f"{k:>20}: {v:8.3f} ms")


if __name__ == "__main__":
    main()
