"""Per-piece timing of the dense advance superstep on the real chip.

Decomposes the BFS dense level into its engine pieces so perf work has
ground truth (VERDICT round-1 weak #1/#8: per-superstep phase timing).

Methodology: each piece is replayed R times inside one jitted fori_loop
with a data dependence threaded through (sum of one lane), then a scalar
fetch fences the tunneled runtime. Reported ms = (t(R) - t(1)) / (R - 1).
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, arg, runs=16, cycles=3):
    """Amortized per-call ms of state = fn(state) replayed `runs` times."""

    @partial(jax.jit, static_argnums=(1,))
    def replay(a, R):
        def body(i, s):
            return fn(s)
        return jax.lax.fori_loop(0, R, body, a)

    def once(R):
        t0 = time.perf_counter()
        out = replay(arg, R)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[0])
        return (time.perf_counter() - t0) * 1e3

    once(1)
    once(runs)
    best = float("inf")
    for _ in range(cycles):
        t1 = once(1)
        tR = once(runs)
        best = min(best, max((tR - t1) / (runs - 1), 1e-6))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=18)
    ap.add_argument("--ef", type=int, default=16)
    args = ap.parse_args()

    from essentials_tpu.formats import Csr
    from essentials_tpu.graph import build_graph
    from essentials_tpu.io import generate
    from essentials_tpu.algorithms import bfs
    from essentials_tpu.ops import advance, Combine
    from essentials_tpu.ops.segment import (
        expand_multi_then_route, combine_by_offsets_routed, _run_totals)
    from essentials_tpu.ops.permute import apply_plan

    coo = generate.rmat(args.scale, args.ef, seed=1, undirected=True,
                        weighted=False)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=False)
    ep, vp = g.n_edges_padded, g.n_vertices_padded
    print(f"V={g.n_vertices} E={g.n_edges} Ep={ep} Vp={vp} "
          f"maxdeg={g.max_degree} backend={jax.default_backend()}")

    res = {}
    f0 = jnp.zeros(vp, jnp.int8).at[:vp // 3].set(1)
    ei = jnp.arange(ep, dtype=jnp.int32) % 1024

    # 1. bare cube route over the edge axis (CSR->CSC fwd plan)
    if g.route_fwd is not None:
        res["route_1xi32"] = timeit(
            lambda x: apply_plan((x + 1).astype(jnp.int32), g.route_fwd), ei)

    # 2. fused expand chain (offsets-route + cumsum + fwd route)
    def exp_chain(f):
        out = expand_multi_then_route((f,), g.off_route_csr, g.route_fwd,
                                      n_valid=ep)[0]
        return (f + out[0]).astype(jnp.int8)
    if g.off_route_csr is not None and g.route_fwd is not None:
        res["expand_chain_i8"] = timeit(exp_chain, f0)

    # 3. combine (OR) over CSC offsets (routed backward + prescan)
    def comb(x):
        out = combine_by_offsets_routed(x != 0, g.off_route_csc, Combine.OR,
                                        g.csc_seg_flags)
        return x + out[0].astype(jnp.int32)
    res["combine_or"] = timeit(comb, ei)

    # 4. V-axis run totals (expand preamble)
    def rt(v):
        d = jnp.diff(v, prepend=jnp.zeros(1, jnp.int32))
        return _run_totals(d, g.off_route_csr)[:vp] + v
    if g.off_route_csr is not None:
        res["run_totals_V"] = timeit(rt, jnp.arange(vp, dtype=jnp.int32))

    # 5. full dense advance (reach, OR)
    def reach(f):
        out = advance(g, lambda e: True, f != 0, combine=Combine.OR,
                      with_frontier=False)
        return f + out.astype(jnp.int8)
    res["dense_reach"] = timeit(reach, f0)

    # 6. full bfs.step
    def stepfn(st):
        return bfs.step(g, st, jnp.int32(1))
    res["bfs_step"] = timeit(stepfn, bfs.init(g, 0))

    # 7. V-sized sort (compact_frontier cost)
    res["sort_V"] = timeit(lambda x: jax.lax.sort(x) + 1,
                           jnp.arange(vp, dtype=jnp.int32))

    # 8. level populations for the benchmark sources
    srcs = np.argsort(-np.diff(np.asarray(csr.row_offsets)))[:4]
    for s in srcs[:2]:
        r = bfs.run(g, int(s), compute_predecessors=False)
        d = np.asarray(r.distances)
        levels = [int((d == i).sum()) for i in range(int(r.iterations) + 1)]
        deg = np.diff(np.asarray(csr.row_offsets))
        outed = [int(deg[d == i].sum()) for i in range(int(r.iterations) + 1)]
        print(f"src={s}: levels={levels}")
        print(f"   out-edges/level={outed}")

    for k, v in res.items():
        print(f"{k:>18}: {v:8.3f} ms")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
