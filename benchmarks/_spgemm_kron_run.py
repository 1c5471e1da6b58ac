"""First real kron_s16-scale SpGEMM run (chunked numeric phase) + a
host-validated sample. Usage: python benchmarks/_spgemm_kron_run.py
[dataset=datasets/kron_s16.mtx] [chunk_log2=25]"""

import sys
import time

import numpy as np


def main():
    from essentials_tpu.io import load_graph_file
    from essentials_tpu.algorithms import spgemm as SG

    path = sys.argv[1] if len(sys.argv) > 1 else "datasets/kron_s16.mtx"
    wc = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 25)
    t0 = time.perf_counter()
    a = load_graph_file(path)
    print(f"loaded {path}: {a.n_rows}x{a.n_cols} nnz={a.nnz} "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)

    t0 = time.perf_counter()
    plan = SG.make_chunked_plan(a, a, chunk_products=wc,
                                cache_dir="datasets/.plan_cache")
    sym = time.perf_counter() - t0
    print(f"symbolic: {sym:.1f}s  products={plan.n_products} "
          f"chunks={len(plan.chunks)} Ecap={plan.Ecap} "
          f"c_nnz={plan.c_col_indices.shape[0]}", flush=True)

    t0 = time.perf_counter()
    vals = SG.numeric_chunked(plan, a, a)          # warm (compile)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    vals = SG.numeric_chunked(plan, a, a)
    ms = (time.perf_counter() - t0) * 1e3
    useful = plan.n_products * 8 + vals.shape[0] * 4
    print(f"numeric: {ms:.0f} ms (warm {warm:.0f}s)  "
          f"effective {useful / ms / 1e6:.1f} GB/s", flush=True)

    # validate a sample of C rows against host Gustavson
    rng = np.random.default_rng(0)
    rows = rng.choice(a.n_rows, 32, replace=False)
    off = np.asarray(a.row_offsets, np.int64)
    cols = np.asarray(a.col_indices, np.int64)
    av = np.asarray(a.values, np.float64)
    c_off = np.asarray(plan.c_row_offsets, np.int64)
    c_cols = np.asarray(plan.c_col_indices, np.int64)
    bad = 0
    for r in rows:
        acc = {}
        for e in range(off[r], off[r + 1]):
            k = cols[e]
            for f in range(off[k], off[k + 1]):
                acc[cols[f]] = acc.get(cols[f], 0.0) + av[e] * av[f]
        got_c = c_cols[c_off[r]:c_off[r + 1]]
        got_v = vals[c_off[r]:c_off[r + 1]]
        want_c = np.array(sorted(acc), np.int64)
        if not np.array_equal(got_c, want_c):
            bad += 1
            continue
        want_v = np.array([acc[j] for j in want_c])
        if not np.allclose(got_v, want_v, rtol=2e-3, atol=1e-4):
            bad += 1
    print(f"host validation: {32 - bad}/32 sampled rows exact-structure "
          f"+ close-values", flush=True)
    assert bad == 0


if __name__ == "__main__":
    main()
