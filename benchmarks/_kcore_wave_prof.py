"""Per-piece cost of one adaptive kcore spray wave at rmat20 scale.

VERDICT r4 #4: rmat20 kcore = 814 waves x ~2.5 ms. This isolates the
wave's components (dedup sort, degree gather, spray expansion, scatter,
[Vp] bookkeeping, full step) to find the fixed-cost floor."""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

R = 24


def bench(name, fn, g, st, cycles=3):
    @partial(jax.jit, static_argnums=(2,))
    def replay(g, st, n):
        def body(i, st):
            return fn(g, st, i)
        out = jax.lax.fori_loop(0, n, body, st)
        return sum(jnp.sum(jnp.asarray(o, jnp.float32).ravel()[:4])
                   for o in jax.tree_util.tree_leaves(out))

    def fetch(n):
        t = time.perf_counter()
        float(replay(g, st, n))
        return time.perf_counter() - t

    fetch(1); fetch(R)
    best = min(max((fetch(R) - fetch(1)) / (R - 1), 1e-9)
               for _ in range(cycles)) * 1e3
    print(f"{name:42s} {best:8.3f} ms", flush=True)
    return best


def main():
    from essentials_tpu.formats import Csr
    from essentials_tpu.graph import build_graph
    from essentials_tpu.io import generate
    from essentials_tpu.algorithms import kcore
    from essentials_tpu.ops.sparse_advance import (
        spray_dedup, frontier_out_degree, spray_candidates, SPRAY_BUDGET,
        SPRAY_K, TINY_BUDGET, TINY_K, compact_frontier)

    t0 = time.perf_counter()
    coo = generate.rmat(20, 30, seed=3, undirected=True, weighted=False)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=False)
    vp = g.n_vertices_padded
    print(f"built V={g.n_vertices} E={g.n_edges} "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)

    pad = g.pad_vertex
    key = jax.random.PRNGKey(1)
    some = jax.random.choice(key, g.n_vertices, (64,), replace=False)
    fidx_t = jnp.full(TINY_K, pad, jnp.int32).at[:64].set(
        jnp.sort(some).astype(jnp.int32))
    peel = jnp.zeros(vp, jnp.bool_).at[fidx_t[:64]].set(True)

    # full adaptive step (wave) as the suite runs it
    st0 = kcore.init(g)
    bench("kcore.step full wave", lambda g, st, i: kcore.step(g, st, i),
          g, st0)

    # pieces at TINY tier
    bench("dedup sort TINY_K",
          lambda g, st, i: (spray_dedup(st[0], st[0] < 100, TINY_K,
                                        pad)[1].astype(jnp.int32), st[1]),
          g, (fidx_t, peel))
    bench("frontier_out_degree TINY_K",
          lambda g, st, i: (st[0] + frontier_out_degree(g, st[0])[1] * 0
                            + i * 0, st[1]),
          g, (fidx_t, peel))

    def spray_piece(g, st, i):
        fidx, peel = st
        offs, d0 = frontier_out_degree(g, fidx)
        _, nb, _, valid = spray_candidates(g, fidx, offs, d0, TINY_BUDGET)
        removed = jnp.zeros(vp, jnp.int32).at[nb].add(
            valid.astype(jnp.int32), mode="drop")
        return (fidx, peel & (removed[:vp] == 0))

    bench("spray+scatter TINY", spray_piece, g, (fidx_t, peel))

    def vp_bookkeeping(g, st, i):
        fidx, peel = st
        deg = g.out_degrees()
        cnt = jnp.count_nonzero(peel)
        sumdeg = jnp.sum(jnp.where(peel, deg, 0))
        alive = peel | (deg > i)
        mn = jnp.min(jnp.where(alive, deg, jnp.iinfo(jnp.int32).max))
        return (fidx + (cnt + sumdeg + mn).astype(jnp.int32) * 0, peel)

    bench("[Vp] bookkeeping (peel/cnt/sumdeg/min)", vp_bookkeeping, g,
          (fidx_t, peel))

    bench("compact_frontier SPRAY_K (Vp sort)",
          lambda g, st, i: (st[0] + compact_frontier(
              st[1], TINY_K, pad) * 0, st[1]),
          g, (fidx_t, peel))


if __name__ == "__main__":
    main()
