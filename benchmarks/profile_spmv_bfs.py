"""Component-level TPU profile: SpMV pipeline pieces (rmat20, tfbc form)
and BFS step pieces (rmat18, wbc form).

Every number is a replay delta — (time of R in-jit iterations minus time of
1) / (R-1) — so dispatch/tunnel latency cancels. Graphs ride as jit
arguments (constant-free HLO, persistent-cache friendly). Run alone: the
axon TPU runtime is single-client.
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

R = 16


def bench(name, make_fn, init_x, g, n_bytes_model=None, cycles=3):
    """make_fn(g, x, i) -> new x (same shape/dtype); measures per-iter ms."""

    @partial(jax.jit, static_argnums=(2,))
    def replay(g, x, n):
        def body(i, x):
            return make_fn(g, x, i)
        out = jax.lax.fori_loop(0, n, body, x)
        # scalar checksum: a VALUE FETCH is the only reliable fence on
        # tunneled runtimes (block_until_ready returns early there)
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
    from essentials_tpu.algorithms import bfs
    from essentials_tpu.ops import advance_count, Combine
    from essentials_tpu.ops.segment import (combine_by_offsets_routed,
                                            expand_multi_then_route)
    from essentials_tpu.ops.scan_kernels import segmented_scan, cumsum
    from essentials_tpu.algorithms.spmv import spmv_pull

    # ---------------- rmat20: SpMV pieces (tfbc form) ----------------
    print("== rmat20 (SpMV pipeline, tfbc) ==", flush=True)
    t0 = time.perf_counter()
    coo = generate.rmat(20, 30, seed=3, undirected=False, weighted=True)
    csr = Csr.from_coo(coo)
    g20 = build_graph(csr, directed=True, weighted=True)
    ep = g20.n_edges_padded
    print(f"built: V={g20.n_vertices} E={g20.n_edges} Ep={ep} "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)
    x0 = jax.random.uniform(jax.random.PRNGKey(0),
                            (g20.n_vertices_padded,), jnp.float32)

    bench("spmv_pull (whole)",
          lambda g, x, i: spmv_pull(g, x)[:x.shape[0]] * 0.5 + x * 0.5,
          x0, g20, n_bytes_model=ep * 8)

    def _expand_route(g, x, i):
        out = expand_multi_then_route((x,), g.off_route_csc, g.route_bwd,
                                      n_valid=g.n_edges_padded)[0]
        return x + out[:x.shape[0]] * 1e-9

    bench("expand+route x (5k chain)", _expand_route, x0, g20,
          n_bytes_model=ep * 8 * 5)

    w0 = jnp.ones(ep, jnp.float32)

    def _combine(g, w, i):
        out = combine_by_offsets_routed(w, g.off_route_csr, Combine.SUM,
                                        g.csr_seg_flags)
        return w + out[0] * 1e-12

    bench("combine_by_offsets_routed f32", _combine, w0, g20,
          n_bytes_model=ep * 8 * 4)

    def _segscan(g, w, i):
        return segmented_scan(w, g.csr_seg_flags, "add") * 1e-9 + 1.0

    bench("segmented_scan f32 [Ep]", _segscan, w0, g20,
          n_bytes_model=ep * 8)

    def _cumsum(g, w, i):
        return cumsum(w) * 1e-9 + 1.0

    bench("plain cumsum f32 [Ep]", _cumsum, w0, g20, n_bytes_model=ep * 8)

    del g20, x0, w0

    # ---------------- rmat18: BFS pieces (wbc form) ----------------
    print("== rmat18 (BFS step pieces, wbc) ==", flush=True)
    t0 = time.perf_counter()
    coo = generate.rmat(18, 16, seed=1, undirected=True, weighted=False)
    csr = Csr.from_coo(coo)
    g18 = build_graph(csr, directed=False, weighted=False)
    ep = g18.n_edges_padded
    vp = g18.n_vertices_padded
    print(f"built: V={g18.n_vertices} E={g18.n_edges} Ep={ep} "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)

    f0 = jnp.zeros(vp, jnp.bool_).at[5].set(True)

    bench("advance_count (7k chain)",
          lambda g, f, i: advance_count(g, f) > 0, f0, g18,
          n_bytes_model=ep * 8 * 7)

    # full bfs.step in a while-free fori (state as tuple)
    st0 = bfs.init(g18, 5)

    def _bfs_step(g, st, i):
        return tuple(bfs.step(g, bfs.BfsState(*st), i))

    bench("bfs.step (full adaptive)", _bfs_step, tuple(st0), g18)

    # floor: same carried state, trivial body
    def _floor(g, st, i):
        d, f, fi, fc, fv = st
        return (d + 1, ~f, fi, fc + 1, fv)

    bench("carried-state floor (no work)", _floor, tuple(st0), g18)

    # spray branch alone (tiny frontier, forced)
    from essentials_tpu.ops.sparse_advance import (
        frontier_out_degree, spray_reach, SPRAY_BUDGET, spray_k)
    K = spray_k(g18)
    fidx0 = jnp.full(K, g18.pad_vertex, jnp.int32).at[0].set(5)
    un0 = jnp.ones(vp, jnp.bool_)

    def _spray(g, st, i):
        fidx, un = st
        offs, deg = frontier_out_degree(g, fidx)
        newly, nidx, nc = spray_reach(g, fidx, offs, deg, un, SPRAY_BUDGET, K)
        return (jnp.where(nc > 0, nidx, fidx), un & ~newly)

    bench("spray step (deg+reach+dedup)", _spray, (fidx0, un0), g18)

    # dense branch pieces: count_nonzero + compact (the transition logic)
    from essentials_tpu.ops.sparse_advance import compact_frontier

    def _compact(g, f, i):
        fc = jnp.count_nonzero(f)
        nidx = jax.lax.cond(
            fc <= K, lambda m: compact_frontier(m, K, g.pad_vertex),
            lambda m: jnp.full(K, g.pad_vertex, jnp.int32), f)
        return f.at[nidx[0] % vp].set(True)

    bench("count_nonzero+compact [Vp]", _compact, f0, g18)


if __name__ == "__main__":
    main()
