"""A/B the hybrid driver by mode on rmat18 (bench protocol)."""
import time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
from essentials_tpu.formats import Csr
from essentials_tpu.graph import build_graph
from essentials_tpu.io import generate
from essentials_tpu.algorithms import bfs

coo = generate.rmat(18, 16, seed=1, undirected=True, weighted=False)
csr = Csr.from_coo(coo)
g = build_graph(csr, directed=False, weighted=False)
RUNS = 16
sources = jnp.asarray(np.argsort(-np.diff(np.asarray(csr.row_offsets)))[:RUNS].astype(np.int32))
max_it = 64

def bench(fn, label):
    @partial(jax.jit, static_argnums=(1,))
    def replay(srcs, R):
        def one(i, carry):
            acc, _ = carry
            dist, it = fn(srcs[i % RUNS])
            return acc + jnp.sum(dist[:256] % 97) + it, it
        return jax.lax.fori_loop(0, R, one,
                                 (jnp.int32(0), jnp.int32(0)))
    def timed(R):
        t0 = time.perf_counter()
        acc, it = replay(sources, R)
        _ = int(acc)
        return (time.perf_counter() - t0) * 1e3, int(it)
    timed(1); timed(RUNS)
    cycles = []
    for _ in range(5):
        t1, _ = timed(1)
        tR, it = timed(RUNS)
        cycles.append(max((tR - t1) / (RUNS - 1), 1e-6))
    med = float(np.median(cycles))
    print(f"{label:16s} med {med:7.3f} ms  "
          f"{g.n_edges/1e6/(med/1e3):6.0f} MTEPS  iters {it}", flush=True)

def fused_only(s):
    from essentials_tpu.ops import fused_bfs as FB
    lev, it, unr = bfs.run_fused_levels(g, s, max_it)
    return FB.collapse_lev_exp(g, lev, s, unr)[:g.n_vertices_padded], it

bench(fused_only, "dense-only(swar)")
bench(lambda s: bfs.run_hybrid_levels(g, s, max_it, spray_override=False),
      "hybrid(no-spray)")
bench(lambda s: bfs.run_hybrid_levels(g, s, max_it, spray_override=True),
      "hybrid(spray)")
