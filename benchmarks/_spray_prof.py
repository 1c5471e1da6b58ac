import time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
from essentials_tpu.formats import Csr
from essentials_tpu.graph import build_graph
from essentials_tpu.io import generate
from essentials_tpu.algorithms import bfs
from essentials_tpu.ops.sparse_advance import (
    spray_reach, frontier_out_degree, compact_frontier, spray_dedup,
    spray_candidates)

coo = generate.rmat(18, 16, seed=1, undirected=True, weighted=False)
csr = Csr.from_coo(coo)
g = build_graph(csr, directed=False, weighted=False)
R = 32
K = bfs.HYBRID_K
vp = g.n_vertices_padded

def replay_time(make_body, x0):
    @partial(jax.jit, static_argnums=(1,))
    def run(x, n):
        return jax.lax.fori_loop(0, n, make_body, x)
    def timed(n):
        t0 = time.perf_counter()
        out = run(x0, n); jax.block_until_ready(out)
        return (time.perf_counter() - t0) * 1e3
    timed(1); timed(R)
    vals = []
    for _ in range(5):
        t1 = timed(1); tR = timed(R)
        vals.append(max((tR - t1) / (R - 1), 1e-6))
    return float(np.median(vals))

# fixed test frontier: 8000 vertices, small degrees
deg_all = np.diff(np.asarray(csr.row_offsets))
idx_small = np.argsort(deg_all)[::-1]
tail = np.where(deg_all[idx_small].cumsum() <= 30000)[0]
fi = idx_small[tail][:K]
fidx0 = np.full(K, g.pad_vertex, np.int32)
fidx0[:len(fi)] = np.sort(fi)
fidx0 = jnp.asarray(fidx0)
dist0 = jnp.full(vp, bfs.UNREACHED, jnp.int32)
lev0 = jnp.full(g.n_edges_padded, 127, jnp.int32)

def b_outdeg(i, c):
    fidx, acc = c
    offs, deg = frontier_out_degree(g, fidx)
    return fidx, acc + offs[0] + deg[0]

def b_sprayreach(i, c):
    fidx, acc = c
    offs, deg = frontier_out_degree(g, fidx)
    newly, nidx, nc = spray_reach(g, fidx, offs, deg, dist0 == bfs.UNREACHED,
                                  bfs.HYBRID_BUDGET, K)
    return fidx, acc + nc + newly[0]

def b_sprayfull(i, c):
    # the whole spray_level body incl. touch-up
    fidx, acc = c
    offs, deg = frontier_out_degree(g, fidx)
    newly, nidx, nc = spray_reach(g, fidx, offs, deg, dist0 == bfs.UNREACHED,
                                  bfs.HYBRID_BUDGET, K)
    offs2, deg2 = frontier_out_degree(g, nidx)
    nds = jnp.sum(deg2)
    tgt = jnp.where(nidx != g.pad_vertex, offs2, g.n_edges_padded)
    lev2 = lev0.at[tgt].set(i + 1, mode="drop")
    return fidx, acc + nds + lev2[0] + nc

def b_compact(i, c):
    fidx, acc = c
    m = dist0 == (bfs.UNREACHED - 1)
    f2 = compact_frontier(m.at[i].set(True), K, g.pad_vertex)
    return fidx, acc + f2[0]

for name, body in [("outdeg", b_outdeg), ("spray_reach", b_sprayreach),
                   ("spray_full", b_sprayfull), ("compact", b_compact)]:
    t = replay_time(body, (fidx0, jnp.int32(0)))
    print(f"{name:12s} {t:8.3f} ms", flush=True)
