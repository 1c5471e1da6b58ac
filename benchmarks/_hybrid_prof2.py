"""Per-level cost profile of run_hybrid_levels: time max_it=1..6 and diff.
Also time standalone pieces (spray level, transition collapse+compact)."""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from essentials_tpu.formats import Csr
from essentials_tpu.graph import build_graph
from essentials_tpu.io import generate
from essentials_tpu.algorithms import bfs

SCALE, EF, RUNS = 18, 16, 16
coo = generate.rmat(SCALE, EF, seed=1, undirected=True, weighted=False)
csr = Csr.from_coo(coo)
g = build_graph(csr, directed=False, weighted=False)
sources = jnp.asarray(np.argsort(-np.diff(csr.row_offsets))[:RUNS]
                      .astype(np.int32))


def timed(replay, R):
    t0 = time.perf_counter()
    acc = replay(g, sources, R)
    _ = float(np.asarray(acc).reshape(-1)[0])
    return (time.perf_counter() - t0) * 1e3


def bench(name, fn):
    @partial(jax.jit, static_argnums=(2,))
    def replay(g, sources, R):
        def one(i, carry):
            r = fn(g, sources[i % RUNS])
            return carry + r
        return jax.lax.fori_loop(0, R, one, jnp.asarray(0, jnp.int32))
    timed(replay, 1)
    timed(replay, RUNS)
    cyc = []
    for _ in range(3):
        t1 = timed(replay, 1)
        tR = timed(replay, RUNS)
        cyc.append((tR - t1) / (RUNS - 1))
    m = float(np.median(cyc))
    print(f"{name}: {m:.3f} ms", flush=True)
    return m


prev = 0.0
for mi in range(1, 7):
    def fn(g, s, mi=mi):
        dist, it = bfs.run_hybrid_levels(g, s, mi)
        return jnp.sum(dist[:64] % 97) + it
    t = bench(f"hybrid max_it={mi}", fn)
    print(f"   level {mi} marginal: {t - prev:.3f} ms", flush=True)
    prev = t
