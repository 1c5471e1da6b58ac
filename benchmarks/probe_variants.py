"""Probe: time adaptive / fused / hybrid BFS variants back-to-back with the
bench.py replay protocol (fori_loop over R runs, subtract R=1 dispatch) on
whatever chip the driver/environment gives us. Diagnostic for the r2
regression (BENCH_r02: 20.5 ms/run where the builder measured 6.9 ms)."""
from __future__ import annotations

import json
import sys
import time
from functools import partial

SCALE = 18
EDGE_FACTOR = 16
RUNS = 16


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from essentials_tpu.formats import Csr
    from essentials_tpu.graph import build_graph
    from essentials_tpu.io import generate
    from essentials_tpu.algorithms import bfs

    coo = generate.rmat(SCALE, EDGE_FACTOR, seed=1, undirected=True,
                        weighted=False)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=False)
    sources = jnp.asarray(
        np.argsort(-np.diff(csr.row_offsets))[:RUNS].astype(np.int32))
    max_it = 64

    def make_replay(variant):
        @partial(jax.jit, static_argnums=(2,))
        def replay(g, sources, R):
            def one(i, carry):
                acc, _ = carry
                if variant == "hybrid":
                    dist, it = bfs.run_hybrid_levels(g, sources[i % RUNS],
                                                     max_it)
                    return acc + jnp.sum(dist[:256] % 97) + it, it
                if variant == "fused":
                    from essentials_tpu.ops import fused_bfs as FB
                    lev, it, unreached = bfs.run_fused_levels(
                        g, sources[i % RUNS], max_it)
                    dist = FB.collapse_lev_exp(g, lev, sources[i % RUNS],
                                               unreached)
                    return acc + jnp.sum(dist[:256] % 97) + it, it
                st = bfs.init(g, sources[i % RUNS])
                def cond(c):
                    return (c[1] < max_it) & jnp.any(c[0].frontier)
                def body(c):
                    return bfs.step(g, c[0], c[1]), c[1] + 1
                st, it = jax.lax.while_loop(
                    cond, body, (st, jnp.asarray(0, jnp.int32)))
                return acc + jnp.sum(st.distances % 97) + it, it
            return jax.lax.fori_loop(
                0, R, one,
                (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)))
        return replay

    out = {}
    for variant in ("adaptive", "fused", "hybrid"):
        replay = make_replay(variant)

        def timed(R):
            t0 = time.perf_counter()
            acc, it = replay(g, sources, R)
            _ = int(acc)
            return (time.perf_counter() - t0) * 1e3, int(it), int(acc)

        tc0 = time.perf_counter()
        timed(1)
        timed(RUNS)
        compile_s = time.perf_counter() - tc0
        cyc = []
        for _ in range(5):
            t1, _, _ = timed(1)
            tR, it, acc = timed(RUNS)
            cyc.append(max((tR - t1) / (RUNS - 1), 1e-6))
        med = float(np.median(cyc))
        mteps = (g.n_edges / 1e6) / (med / 1e3)
        out[variant] = {"med_ms": round(med, 3), "mteps": round(mteps, 1),
                        "cycles_ms": [round(c, 3) for c in cyc],
                        "iters": it, "acc": acc,
                        "compile_s": round(compile_s, 1)}
        print(f"{variant}: {out[variant]}", file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
