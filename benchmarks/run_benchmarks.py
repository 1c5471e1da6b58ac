"""Benchmark harness: every algorithm on a dataset suite, JSON output.

Reference parity: the NVBench binaries + test_benchmarks.sh
(/root/reference/benchmarks/, emits per-algorithm JSON). This environment
has no dataset egress, so the default suite is generated (see
datasets/generate_suite.py); pass .mtx paths to use real graphs.

Usage:
  python benchmarks/run_benchmarks.py [--cpu] [--out results.json] [graphs...]
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(path: str):
    """A dataset path, or a generator spec 'gen:rmat20x16' /
    'gen:grid2048' / 'gen:uniform1048576x8' (no .mtx materialization)."""
    from essentials_tpu.io import load_graph_file, generate
    from essentials_tpu.io.loader import extract_dataset
    from essentials_tpu.formats import Csr
    if not path.startswith("gen:"):
        return load_graph_file(path), extract_dataset(path)
    spec = path[4:]
    if spec.startswith("rmat"):
        scale, ef = spec[4:].split("x")
        coo = generate.rmat(int(scale), int(ef), seed=1, undirected=True,
                            weighted=True)
    elif spec.startswith("grid"):
        side = int(spec[4:])
        coo = generate.grid_2d(side, weighted=True)
    elif spec.startswith("uniform"):
        n, d = spec[7:].split("x")
        coo = generate.uniform_random(int(n), int(d), seed=2,
                                      undirected=True, weighted=True)
    else:
        raise ValueError(spec)
    return Csr.from_coo(coo), spec


def bench_graph(path: str, runs: int, skip: set | None = None) -> list[dict]:
    import numpy as np
    from essentials_tpu.graph import build_graph
    from essentials_tpu import algorithms as A
    from essentials_tpu.utils.stats import collect_stats

    csr, ds = _load(path)
    g = build_graph(csr, directed=False, weighted=True)
    source = int(np.argmax(np.diff(np.asarray(csr.row_offsets))))
    out = []

    # per-dispatch floor of this runtime (tunneled TPU pools add ~20-30 ms
    # RTT per run; small rows carry it — readers subtract this)
    import time as _time
    import jax as _jax
    import jax.numpy as _jnp
    _nop = _jax.jit(lambda x: x + 1)
    _nop(_jnp.zeros(8)).block_until_ready()
    floors = []
    for _ in range(5):
        t0 = _time.perf_counter()
        float(_nop(_jnp.zeros(8))[0])
        floors.append((_time.perf_counter() - t0) * 1e3)
    dispatch_floor = round(float(np.median(floors)), 3)
    print(f"  (dispatch floor {dispatch_floor} ms)")

    def record(name, run_fn, *a, **kw):
        if skip and name in skip:
            print(f"  {name:8s} skipped")
            return
        try:
            res = run_fn(*a, warmup=True, **kw)
            times = [res.elapsed_ms]
            for _ in range(runs - 1):
                times.append(run_fn(*a, warmup=False, **kw).elapsed_ms)
            ms = float(np.median(times))
            iters = getattr(res, "iterations", 1)
            st = collect_stats(name, ds, g, ms, iters, cycles_ms=times)
            rec = json.loads(st.to_json())
            rec["dispatch_floor_ms"] = dispatch_floor
            out.append(rec)
            print(f"  {name:8s} {ms:10.3f} ms  {st.mteps:10.1f} MTEPS  "
                  f"{st.gbps_effective:8.1f} GB/s "
                  f"({100 * st.pct_hbm_roofline:5.1f}% HBM)", flush=True)
        except Exception as e:  # keep the suite running
            print(f"  {name:8s} FAILED: {type(e).__name__}: {e}")
            out.append({"algorithm": name, "dataset": ds, "error": str(e)})

    record("bfs", A.bfs.run, g, source)
    if A.bfs.fused_supported(g):
        record("bfs_fused", A.bfs.run, g, source, variant="fused")
    record("sssp", A.sssp.run, g, source)
    record("pr", A.pr.run, g)
    record("ppr", A.ppr.run, g, source)
    record("bc", A.bc.run, g, source)
    record("color", A.color.run, g)
    record("kcore", A.kcore.run, g)
    record("hits", A.hits.run, g)
    record("spmv", A.spmv.run, g)
    record("tc", A.tc.run, csr)
    record("mst", A.mst.run, g)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("graphs", nargs="*",
                   default=["datasets/chesapeake.mtx"])
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--out", default=None)
    p.add_argument("--skip", default="",
                   help="comma-separated algorithm names to skip")
    args = p.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    skip = {s for s in args.skip.split(",") if s}
    results = []
    for path in args.graphs:
        print(f"== {path} ==")
        results.extend(bench_graph(path, args.runs, skip))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
