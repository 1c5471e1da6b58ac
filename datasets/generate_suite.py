"""Generate the benchmark dataset suite as .mtx files.

Reference parity: datasets/Makefile downloads SuiteSparse/DIMACS graphs
(soc-LiveJournal1, road_usa, kron_g500, ...). This environment has no
network egress, so structurally analogous synthetic graphs are generated:

  kron_N       — RMAT/Kronecker power-law (kron_g500 analogue)
  road_N       — 2-D grid mesh, high diameter (road network analogue)
  uniform_N    — Erdos-Renyi-ish (webbase-like degree concentration)

Usage: python datasets/generate_suite.py [--small|--medium|--large] [outdir]
"""

import os
import sys


def main():
    args = [a for a in sys.argv[1:]]
    size = "--small"
    for s in ("--small", "--medium", "--large"):
        if s in args:
            size = s
            args.remove(s)
    outdir = args[0] if args else os.path.dirname(os.path.abspath(__file__))

    from essentials_tpu.io import generate
    from essentials_tpu.io.matrix_market import write_mtx

    scale = {"--small": 12, "--medium": 16, "--large": 20}[size]
    side = {"--small": 64, "--medium": 512, "--large": 2048}[size]
    n = {"--small": 4096, "--medium": 65536, "--large": 1 << 20}[size]

    jobs = [
        (f"kron_s{scale}", lambda: generate.rmat(scale, 16, seed=1)),
        (f"road_{side}x{side}", lambda: generate.grid_2d(side, weighted=True)),
        (f"uniform_{n}", lambda: generate.uniform_random(n, 8, seed=2)),
    ]
    for name, fn in jobs:
        path = os.path.join(outdir, f"{name}.mtx")
        if os.path.exists(path):
            print(f"{path} exists, skipping")
            continue
        coo = fn()
        write_mtx(path, coo)
        print(f"wrote {path}  ({coo.n_rows} vertices, {coo.nnz} edges)")


if __name__ == "__main__":
    main()
