"""Stage-by-stage cost of the hybrid spray level at budget/K = 32768.
Each stage is timed cumulatively with the fori replay protocol."""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from essentials_tpu.formats import Csr
from essentials_tpu.graph import build_graph
from essentials_tpu.io import generate
from essentials_tpu.ops.sparse_advance import (
    frontier_out_degree, spray_candidates, spray_dedup)

SCALE, EF, RUNS = 18, 16, 16
B = K = 1 << 15

coo = generate.rmat(SCALE, EF, seed=1, undirected=True, weighted=False)
csr = Csr.from_coo(coo)
g = build_graph(csr, directed=False, weighted=False)
hub = int(np.argmax(np.diff(csr.row_offsets)))
print("hub degree:", int(np.diff(csr.row_offsets)[hub]))

# a realistic fidx: the hub's neighbors (as if level-1 frontier)
offs = np.asarray(csr.row_offsets)
nbrs = np.asarray(csr.col_indices)[offs[hub]:offs[hub + 1]]
nbrs = np.unique(nbrs)[:K]
fidx0 = np.full(K, g.pad_vertex, np.int32)
fidx0[:len(nbrs)] = nbrs
fidx0 = jnp.asarray(fidx0)
dist0 = jnp.full(g.n_vertices_padded, 2 ** 30, jnp.int32)
lev0 = jnp.full(g.n_edges_padded, 127, jnp.int32)


def timed(fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    cyc = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        cyc.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(cyc))


def stage(name, body):
    @jax.jit
    def reps(g, fidx, dist, lev):
        def one(i, c):
            return c + body(g, fidx, dist, lev, i)
        return jax.lax.fori_loop(0, RUNS, one, jnp.int32(0))
    t1 = timed(jax.jit(lambda g, f, d, l: body(g, f, d, l, jnp.int32(0))),
               g, fidx0, dist0, lev0)
    tR = timed(reps, g, fidx0, dist0, lev0)
    print(f"{name}: amortized {(tR - t1) / (RUNS - 1):.3f} ms "
          f"(single-dispatch {t1:.3f})", flush=True)


def s_deg(g, fidx, dist, lev, i):
    offs, deg = frontier_out_degree(g, fidx)
    return jnp.sum(deg) + i


def s_cand(g, fidx, dist, lev, i):
    offs, deg = frontier_out_degree(g, fidx)
    e, nb, _, valid = spray_candidates(g, fidx, offs, deg, B)
    return jnp.sum(nb) + i


def s_dedup(g, fidx, dist, lev, i):
    offs, deg = frontier_out_degree(g, fidx)
    e, nb, _, valid = spray_candidates(g, fidx, offs, deg, B)
    fresh = valid & (dist[nb] > 0)
    uniq, nidx, nc = spray_dedup(nb, fresh, K, g.pad_vertex)
    return nc + i


def s_scatterV(g, fidx, dist, lev, i):
    offs, deg = frontier_out_degree(g, fidx)
    e, nb, _, valid = spray_candidates(g, fidx, offs, deg, B)
    fresh = valid & (dist[nb] > 0)
    uniq, nidx, nc = spray_dedup(nb, fresh, K, g.pad_vertex)
    newly = jnp.zeros(g.n_vertices_padded, jnp.bool_).at[uniq].set(
        True, mode="drop")
    return nc + jnp.count_nonzero(newly).astype(jnp.int32) + i


def s_scatterE(g, fidx, dist, lev, i):
    offs, deg = frontier_out_degree(g, fidx)
    e, nb, _, valid = spray_candidates(g, fidx, offs, deg, B)
    fresh = valid & (dist[nb] > 0)
    uniq, nidx, nc = spray_dedup(nb, fresh, K, g.pad_vertex)
    offs2, deg2 = frontier_out_degree(g, nidx)
    tgt = jnp.where(nidx != g.pad_vertex, offs2, g.n_edges_padded)
    lev2 = lev.at[tgt].set(i + 1, mode="drop")
    return nc + lev2[0] + i


for nm, fn in [("deg-sum", s_deg), ("+candidates", s_cand),
               ("+dedup", s_dedup), ("+scatterV", s_scatterV),
               ("+scatterE(lev)", s_scatterE)]:
    stage(nm, fn)
