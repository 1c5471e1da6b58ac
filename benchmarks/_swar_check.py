"""Validate + time the SWAR fused level on TPU (rmat18 bench graph)."""
import time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
from essentials_tpu.formats import Csr
from essentials_tpu.graph import build_graph
from essentials_tpu.io import generate
from essentials_tpu.algorithms import bfs
from essentials_tpu.ops import fused_bfs as FB

coo = generate.rmat(18, 16, seed=1, undirected=True, weighted=False)
csr = Csr.from_coo(coo)
g = build_graph(csr, directed=False, weighted=False)
R = 32

# 1) correctness: full fused BFS (swar path, max_it=64) vs cpu reference
for s in (0, 12345):
    res = bfs.run(g, s, warmup=False, variant="fused", max_iterations=64,
                  compute_predecessors=False)
    ref = bfs.cpu_reference(csr, s)
    ok = np.array_equal(np.asarray(res.distances), ref)
    print("fused-swar", s, "ok" if ok else "MISMATCH", "iters",
          res.iterations, flush=True)
    if not ok:
        d = np.asarray(res.distances); bad = np.nonzero(d != ref)[0]
        print("  nbad", len(bad), bad[:8], d[bad[:8]], ref[bad[:8]])

# 2) per-level replay timing: swar vs int32 v2
fp = FB.pack_flags(g.csc_seg_flags, g.route_fwd.length)
lev8 = FB.init_lev_exp(g, 0, FB.UNREACHED_E)
lev32 = FB.init_lev_exp(g, 0, FB.UNREACHED)

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

def b_swar(i, x):
    lev2, _ = FB.fused_superstep2(g, x, i, swar=True, fp=fp)
    return lev2

def b_v2(i, x):
    lev2, _ = FB.fused_superstep2(g, x, i)
    return lev2

t_s = replay_time(b_swar, lev8)
t_v = replay_time(b_v2, lev32)
E = g.n_edges
print(f"swar level {t_s:7.3f} ms ({E/1e6/(t_s*1e-3):6.0f} MTEPS/level)",
      flush=True)
print(f"v2   level {t_v:7.3f} ms ({E/1e6/(t_v*1e-3):6.0f} MTEPS/level)",
      flush=True)
