"""A/B fused vs adaptive SSSP on rmat20 and road_512x512 (replay timing)."""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from essentials_tpu.formats import Csr
from essentials_tpu.graph import build_graph
from essentials_tpu.io import generate
from essentials_tpu.algorithms import sssp
from essentials_tpu.ops.fused_sssp import run_fused_sssp

R = 4

specs = sys.argv[1:] or ["rmat20", "road512"]
for spec in specs:
    if spec.startswith("rmat"):
        coo = generate.rmat(int(spec[4:]), 16, seed=1, undirected=True,
                            weighted=True)
    else:
        coo = generate.grid_2d(int(spec[4:]), weighted=True)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=True)
    src = int(np.argmax(np.diff(csr.row_offsets)))
    max_it = g.n_vertices + 1

    @partial(jax.jit, static_argnums=(2,))
    def replay(g, src, R):
        def one(i, carry):
            acc, _ = carry
            dist, it = run_fused_sssp(g, src + i, max_it)
            return acc + jnp.sum(dist[:64]) + it, it
        return jax.lax.fori_loop(
            0, R, one, (jnp.asarray(0, jnp.float32), jnp.asarray(0, jnp.int32)))

    t0 = time.perf_counter()
    acc, it = replay(g, src, 1)
    _ = float(acc)
    print(f"{spec}: fused compile+first {time.perf_counter()-t0:.1f}s "
          f"iters={int(it)}", flush=True)
    acc, it = replay(g, src, R)
    _ = float(acc)
    cyc = []
    for _ in range(3):
        t0 = time.perf_counter(); acc, _ = replay(g, src, 1); _ = float(acc)
        t1 = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter(); acc, it = replay(g, src, R); _ = float(acc)
        tR = (time.perf_counter() - t0) * 1e3
        cyc.append((tR - t1) / (R - 1))
    print(f"{spec}: fused {float(np.median(cyc)):.1f} ms/run "
          f"iters={int(it)}", flush=True)

    res = sssp.run(g, src, warmup=True)
    print(f"{spec}: adaptive {res.elapsed_ms:.1f} ms "
          f"iters={res.iterations}", flush=True)
