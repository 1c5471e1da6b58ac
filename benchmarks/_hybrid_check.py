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

for s in [int(sources[0]), 0, 99999]:
    t0 = time.time()
    res = bfs.run(g, s, warmup=False, variant="hybrid",
                  compute_predecessors=False)
    ref = bfs.cpu_reference(csr, s)
    ok = np.array_equal(np.asarray(res.distances), ref)
    print(s, "ok" if ok else "MISMATCH", "iters", res.iterations,
          f"{time.time()-t0:.0f}s", flush=True)
    if not ok:
        d = np.asarray(res.distances); bad = np.nonzero(d != ref)[0]
        print("  nbad", len(bad), bad[:8], d[bad[:8]], ref[bad[:8]], flush=True)

@partial(jax.jit, static_argnums=(2,))
def replay(g, sources, R):
    def one(i, carry):
        acc, _ = carry
        dist, it = bfs.run_hybrid_levels(g, sources[i % RUNS], max_it)
        return acc + jnp.sum(dist[:256] % 97) + it, it
    return jax.lax.fori_loop(0, R, one,
                             (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)))

def timed(R):
    t0 = time.perf_counter()
    acc, it = replay(g, sources, R)
    _ = int(acc)
    return (time.perf_counter() - t0) * 1e3, int(it)

timed(1); timed(RUNS)
cycles = []
for _ in range(7):
    t1, _ = timed(1)
    tR, it = timed(RUNS)
    cycles.append(max((tR - t1) / (RUNS - 1), 1e-6))
med = float(np.median(cycles))
print(f"hybrid: med {med:.3f} ms -> {g.n_edges/1e6/(med/1e3):.0f} MTEPS, iters {it}", flush=True)
print("cycles", [round(c,3) for c in cycles], flush=True)
