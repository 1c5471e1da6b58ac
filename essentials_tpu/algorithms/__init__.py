"""Graph algorithms, each expressed as iterated operator compositions.

Capability parity with reference include/gunrock/algorithms/ — bfs, sssp, pr,
ppr, bc, color, kcore, mst, tc, hits, geo, spmv, spgemm — each exposing the
reference's param/result/run() shape as a functional `run(graph, ...)`.
"""

from essentials_tpu.algorithms import (bfs, sssp, pr, ppr, bc, color, kcore,
                                       hits, spmv, tc, mst, geo, spgemm,
                                       helpers)

__all__ = ["bfs", "sssp", "pr", "ppr", "bc", "color", "kcore", "hits",
           "spmv", "tc", "mst", "geo", "spgemm", "helpers"]
