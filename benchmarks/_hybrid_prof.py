"""Diagnose hybrid BFS slowness: time fused vs hybrid(all-dense) vs hybrid
per-piece on rmat18 with the replay protocol."""
import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from essentials_tpu.formats import Csr
from essentials_tpu.graph import build_graph
from essentials_tpu.io import generate
from essentials_tpu.algorithms import bfs
from essentials_tpu.ops import fused_bfs as FB

SCALE, EF, RUNS = 18, 16, 16

coo = generate.rmat(SCALE, EF, seed=1, undirected=True, weighted=False)
csr = Csr.from_coo(coo)
g = build_graph(csr, directed=False, weighted=False)
sources = jnp.asarray(np.argsort(-np.diff(csr.row_offsets))[:RUNS]
                      .astype(np.int32))
max_it = 64


def timed(replay, R):
    t0 = time.perf_counter()
    acc, it = replay(g, sources, R)
    _ = int(acc)
    return (time.perf_counter() - t0) * 1e3, int(it)


def bench(name, fn):
    @partial(jax.jit, static_argnums=(2,))
    def replay(g, sources, R):
        def one(i, carry):
            acc, _ = carry
            dist, it = fn(g, sources[i % RUNS], max_it)
            return acc + jnp.sum(dist[:256] % 97) + it, it
        return jax.lax.fori_loop(
            0, R, one, (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)))
    timed(replay, 1)
    timed(replay, RUNS)
    cyc = []
    for _ in range(3):
        t1, _ = timed(replay, 1)
        tR, it = timed(replay, RUNS)
        cyc.append((tR - t1) / (RUNS - 1))
    print(f"{name}: {float(np.median(cyc)):.3f} ms/run iters={it}",
          flush=True)


def fused(g, src, max_it):
    lev, it, unreached = bfs.run_fused_levels(g, src, max_it)
    return FB.collapse_lev_exp(g, lev, src, unreached), it


bench("fused", fused)
bench("hybrid", bfs.run_hybrid_levels)
bench("hybrid_all_dense",
      lambda g, s, m: bfs.run_hybrid_levels(g, s, m, spray_override=False))
