"""Benchmark harness: every algorithm on a dataset suite, JSON output.

Reference parity: the NVBench binaries + test_benchmarks.sh
(/root/reference/benchmarks/, emits per-algorithm JSON). This environment
has no dataset egress, so the default suite is generated (see
datasets/generate_suite.py); pass .mtx paths to use real graphs.

Timing protocol (round 3): amortized replay (benchmarks/replay.py) — each
algorithm's whole run (init/guard + while_loop) replays R times inside one
jitted fori_loop with a single scalar fetch, so rows measure kernels, not
the ~20-30 ms tunneled-dispatch floor. Rows carry `timing: "replay(R=N)"`;
host-phased algorithms (tc) keep single-dispatch timing with the floor
noted.

Usage:
  python benchmarks/run_benchmarks.py [--cpu] [--out results.json] [graphs...]
"""

from __future__ import annotations

import argparse
import json
import os
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


def _dispatch_floor() -> float:
    import time as _time
    import numpy as np
    import jax as _jax
    import jax.numpy as _jnp
    _nop = _jax.jit(lambda x: x + 1)
    float(_nop(_jnp.zeros(8))[0])
    floors = []
    for _ in range(5):
        t0 = _time.perf_counter()
        float(_nop(_jnp.zeros(8))[0])
        floors.append((_time.perf_counter() - t0) * 1e3)
    return round(float(np.median(floors)), 3)


def bench_graph(path: str, runs: int, skip: set | None = None,
                flush=None) -> list[dict]:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from essentials_tpu.graph import build_graph
    from essentials_tpu import algorithms as A
    from essentials_tpu.framework.enactor import default_converged
    from essentials_tpu.utils.stats import collect_stats
    try:
        from benchmarks.replay import replay_ms, enact_body, guard
    except ModuleNotFoundError:     # invoked as `python benchmarks/...`
        from replay import replay_ms, enact_body, guard

    csr, ds = _load(path)
    g = build_graph(csr, directed=False, weighted=True)
    deg = np.diff(np.asarray(csr.row_offsets))
    sources = np.argsort(-deg)[:8].astype(np.int32)
    v1 = g.n_vertices + 1
    out = []
    floor = _dispatch_floor()
    print(f"  (dispatch floor {floor} ms)")
    R = max(runs, 2)

    def add(name, fn):
        if skip and name in skip:
            print(f"  {name:10s} skipped")
            return
        try:
            ms, iters, cycles = fn()
            st = collect_stats(name, ds, g, ms, iters, cycles_ms=cycles)
            rec = json.loads(st.to_json())
            rec["dispatch_floor_ms"] = floor
            rec["timing"] = f"replay(R={R})"
            out.append(rec)
            print(f"  {name:10s} {ms:10.3f} ms  {st.mteps:10.1f} MTEPS  "
                  f"{st.gbps_effective:8.1f} GB/s "
                  f"({100 * st.pct_hbm_roofline:5.1f}% HBM)", flush=True)
        except Exception as e:  # keep the suite running
            print(f"  {name:10s} FAILED: {type(e).__name__}: {e}")
            out.append({"algorithm": name, "dataset": ds, "error": str(e)})
        if flush is not None:
            flush(out)

    def src_body(init_fn, step_fn, conv_fn=default_converged,
                 max_it=None):
        mi = max_it or v1

        def body(g, _, s):
            st0 = init_fn(g, s)

            def cond(c):
                st, it = c
                done = jnp.logical_and(it > 0, conv_fn(g, st, it))
                return jnp.logical_and(it < mi, jnp.logical_not(done))

            return jax.lax.while_loop(
                cond, lambda c: (step_fn(g, c[0], c[1]), c[1] + 1),
                (st0, jnp.int32(0)))
        return body

    # --- traversal (source-seeded) ---
    # bfs first, capturing its search depth: the fused/hybrid bodies pick
    # max_it = 126 (byte-SWAR ladders) when the depth fits a byte, else
    # the exact V+1 bound (int32 ladders) — a 64 cap silently truncated
    # high-diameter graphs (road grids run ~1000 levels)
    bfs_iters = [0]

    def _bfs_row():
        ms, iters, cycles = replay_ms(
            src_body(A.bfs.init, A.bfs.step), g, None, sources, R=R)
        bfs_iters[0] = iters
        return ms, iters, cycles

    add("bfs", _bfs_row)
    max_fused = 126 if 0 < bfs_iters[0] <= 120 else v1
    if A.bfs.fused_supported(g):
        from essentials_tpu.ops import fused_bfs as FB

        def bfs_fused_body(g, _, s):
            lev, it, unreached = A.bfs.run_fused_levels(g, s, max_fused)
            return (FB.collapse_lev_exp(g, lev, s, unreached),), it

        add("bfs_fused", lambda: replay_ms(bfs_fused_body, g, None,
                                           sources, R=R))

        def bfs_hybrid_body(g, _, s):
            dist, it = A.bfs.run_hybrid_levels(g, s, max_fused)
            return (dist,), it

        add("bfs_hybrid", lambda: replay_ms(bfs_hybrid_body, g, None,
                                            sources, R=R))

        def bfs_phased_body(g, _, s):
            dist, it = A.bfs.run_phased_levels(g, s, max_fused)
            return (dist,), it

        add("bfs_phased", lambda: replay_ms(bfs_phased_body, g, None,
                                            sources, R=R))
    add("sssp", lambda: replay_ms(
        src_body(A.sssp.init, A.sssp.step), g, None, sources, R=R))
    if A.sssp.fused_supported(g):
        from essentials_tpu.ops.fused_sssp import run_fused_sssp

        def sssp_fused_body(g, _, s):
            dist, it = run_fused_sssp(g, s, v1)
            return (dist,), it

        add("sssp_fused", lambda: replay_ms(sssp_fused_body, g, None,
                                            sources, R=R))
    add("ppr", lambda: replay_ms(
        src_body(lambda g, s: A.ppr.init(g, s), A.ppr.step), g, None,
        sources, R=R))

    # headline bc/pr/hits rows ride the shared SpMV engine (windowed
    # 3-kernel where the plan builds, fused chain elsewhere); *_generic
    # rows keep the reference-parity formulation measurable
    _spmv_plan = A.pr.spmv_plan(g)

    if A.bc.spmv_supported(g):
        def bc_spmv_body(g, st, s):
            delta, depth, levels = A.bc._single_source_deps_spmv(
                g, st[0], s, v1)
            return (delta,), levels

        add("bc", lambda: replay_ms(bc_spmv_body, g, (_spmv_plan,),
                                    sources, R=R))

    def bc_body(g, _, s):
        delta, depth, levels = A.bc._single_source_deps(g, s, v1)
        return (delta,), levels

    add("bc_generic" if A.bc.spmv_supported(g) else "bc",
        lambda: replay_ms(bc_body, g, None, sources, R=R))

    # --- seedless (guarded init outside the loop) ---
    def pr_spmv_body(g, st, s):
        plan_, iw = st
        ranks, it = A.pr._run_spmv_compiled(
            g, plan_, guard(iw, s), 0.85, 1e-6, v1)
        return (ranks,), it

    add("pr", lambda: replay_ms(pr_spmv_body, g,
                                (_spmv_plan, A.pr.init(g).iweights),
                                sources, R=R))
    add("pr_generic", lambda: replay_ms(
        enact_body(A.pr.step, A.pr.converged, v1), g, A.pr.init(g),
        sources, R=R))
    # headline `color` row mirrors color.run(variant="auto"): spec above
    # the spray threshold (JP's dense-sweep x round-count cost explodes
    # there — 8.3 s vs 206 ms at rmat20), JP below it. `color_jp` keeps the
    # reference-parity formulation measurable everywhere.
    from essentials_tpu.ops.sparse_advance import spray_enabled
    if spray_enabled(g):
        add("color", lambda: replay_ms(
            enact_body(A.color.step_spec, default_converged, v1), g,
            A.color.init_spec(g), sources, R=R))
    else:
        add("color", lambda: replay_ms(
            enact_body(A.color.step, default_converged, v1), g,
            A.color.init(g), sources, R=R))
    add("color_jp", lambda: replay_ms(
        enact_body(A.color.step, default_converged, v1), g,
        A.color.init(g), sources, R=R))
    add("kcore", lambda: replay_ms(
        enact_body(A.kcore.step, A.kcore.converged, v1), g,
        A.kcore.init(g), sources, R=R))
    if A.kcore.fused_supported(g):
        from essentials_tpu.ops.fused_kcore import run_fused_kcore

        def kcore_fused_body(g, _, s):
            core, it = run_fused_kcore(g, 4 * g.n_vertices + 8)
            return (core + (s >> 31),), it

        add("kcore_fused", lambda: replay_ms(kcore_fused_body, g, None,
                                             sources, R=R))
    if A.hits.spmv_supported(g):
        def hits_spmv_body(g, st, s):
            plan_, h0 = st
            auth, hub, it = A.hits._run_spmv_compiled(
                g, plan_, 50, guard(h0, s))
            return (auth, hub), it

        add("hits", lambda: replay_ms(
            hits_spmv_body, g,
            (_spmv_plan, jnp.ones(g.n_vertices_padded, jnp.float32)),
            sources, R=R))
    add("hits_generic" if A.hits.spmv_supported(g) else "hits",
        lambda: replay_ms(
            enact_body(A.hits.step, A.hits.converged, 50), g,
            A.hits.init(g), sources, R=R))
    add("mst", lambda: replay_ms(
        enact_body(A.mst.step, A.mst.converged, v1), g, A.mst.init(g),
        sources, R=R))

    def geo_state0():
        rng = np.random.default_rng(7)
        n = g.n_vertices
        lat = rng.uniform(-60, 60, n).astype(np.float32)
        lon = rng.uniform(-180, 180, n).astype(np.float32)
        unknown = rng.random(n) > 0.2        # 20% located (ref-style input)
        lat[unknown] = np.nan
        lon[unknown] = np.nan
        return A.geo.init(g, lat, lon)

    add("geo", lambda: replay_ms(
        enact_body(A.geo.step, A.geo.converged, 10), g, geo_state0(),
        sources, R=R))

    x0 = None

    # windowed 3-kernel variant when its plan builds (TPU), else the
    # fused chain; the plan rides in the replay STATE (a closed-over
    # plan would bake its stage arrays into the program as constants)
    wplan = (A.spmv.windowed_plan(g)
             if jax.default_backend() == "tpu"
             and A.spmv.fused_supported(g)
             and getattr(g.route_bwd, "form", None) == "tfbc" else None)
    spmv_fn = A.spmv.spmv_fused if A.spmv.fused_supported(g) \
        else A.spmv.spmv_pull

    import jax.numpy as jnp  # noqa: F811
    key = jax.random.PRNGKey(0)
    x0 = jnp.where(g.vertex_mask(),
                   jax.random.uniform(key, (g.n_vertices_padded,),
                                      jnp.float32), 0.0)

    def spmv_row():
        # output-feedback replay (y feeds the next x): the strict serial
        # dependency is the only protocol that reliably keeps the
        # windowed pipeline inside the loop (bench.py protocol; the
        # guard-based replay measured 3x slow here)
        import time as _time
        from functools import partial as _partial

        @_partial(jax.jit, static_argnums=(3,))
        def srep(g, pl_, x, n):
            def body(i, x):
                y = A.spmv.spmv_windowed(g, pl_, x) if pl_ is not None \
                    else spmv_fn(g, x)
                return x * 0.5 + y[:x.shape[0]] * 1e-9
            return jnp.sum(jax.lax.fori_loop(0, n, body, x).ravel()[:8])

        def fetch(n):
            t0 = _time.perf_counter()
            float(srep(g, wplan, x0, n))
            return (_time.perf_counter() - t0) * 1e3

        RR = 16
        fetch(1)
        fetch(RR)
        cyc = []
        for _ in range(3):
            t1 = fetch(1)
            tR = fetch(RR)
            cyc.append(max((tR - t1) / (RR - 1), 1e-6))
        import numpy as _np
        return float(_np.median(cyc)), 1, [round(c, 3) for c in cyc]

    add("spmv", spmv_row)

    # --- spgemm: A @ A numeric phase (structure-static plan), gated on
    # the product count so the symbolic plan stays tractable ---
    if not (skip and "spgemm" in skip):
        try:
            off = np.asarray(csr.row_offsets)
            products = int(deg.astype(np.int64)[np.asarray(
                csr.col_indices)].sum())
            static_ok = False
            if products <= (1 << 26):
                try:
                    from essentials_tpu.algorithms import spgemm as SG
                    import time as _time
                    t0 = _time.perf_counter()
                    plan = SG.make_plan(csr, csr)
                    plan_s = _time.perf_counter() - t0
                    av = jnp.asarray(np.asarray(csr.values, np.float32))

                    # the plan must ride as a jit ARGUMENT: closing over
                    # it bakes its index arrays into the program as
                    # constants (HTTP 413 on remote-compile upload)
                    def spgemm_body(g, st, s):
                        pl_, av_ = st
                        return (SG.numeric(pl_, guard(av_, s), av_),), \
                            jnp.int32(1)

                    ms, iters, cycles = replay_ms(spgemm_body, g,
                                                  (plan, av), sources, R=R)
                    st = collect_stats("spgemm", ds, g, ms, 1,
                                       cycles_ms=cycles,
                                       edges_visited=products)
                    rec = json.loads(st.to_json())
                    rec["dispatch_floor_ms"] = floor
                    rec["timing"] = f"replay(R={R})"
                    rec["plan_seconds"] = round(plan_s, 2)
                    rec["n_products"] = products
                    out.append(rec)
                    print(f"  {'spgemm':10s} {ms:10.3f} ms  "
                          f"(plan {plan_s:.1f}s, {products/1e6:.1f}M "
                          f"products)", flush=True)
                    static_ok = True
                except Exception as e:   # e.g. remote-compile 413
                    print(f"  {'spgemm':10s} static plan failed "
                          f"({type(e).__name__}) -> chunked", flush=True)
            if not static_ok and products <= np.iinfo(np.int32).max:
                # chunked numeric phase (round 4): device sorts, zero
                # per-product plan bytes; timed directly (seconds of
                # device work — dispatch overhead is negligible)
                from essentials_tpu.algorithms import spgemm as SG
                import time as _time
                t0 = _time.perf_counter()
                cplan = SG.make_chunked_plan(
                    csr, csr, cache_dir="datasets/.plan_cache")
                plan_s = _time.perf_counter() - t0
                SG.numeric_chunked(cplan, csr, csr)          # warm
                t0 = _time.perf_counter()
                vals = SG.numeric_chunked(cplan, csr, csr)
                ms = (_time.perf_counter() - t0) * 1e3
                useful = products * 8 + int(vals.shape[0]) * 4
                rec = {"algorithm": "spgemm", "dataset": ds,
                       "elapsed_ms": round(ms, 1),
                       "variant": "chunked",
                       "n_products": products,
                       "c_nnz": int(vals.shape[0]),
                       "n_chunks": len(cplan.chunks),
                       "plan_seconds": round(plan_s, 1),
                       "gbps_effective": round(useful / ms / 1e6, 2),
                       "timing": "direct (chunked host loop)"}
                out.append(rec)
                print(f"  {'spgemm':10s} {ms:10.1f} ms  (chunked x"
                      f"{len(cplan.chunks)}, plan {plan_s:.0f}s, "
                      f"{products/1e6:.0f}M products)", flush=True)
            elif not static_ok:
                # capacity is no longer the wall (int64 product
                # accounting + host-streamed C, benchmarks/spgemm_big.py
                # demonstrates it); the default suite still skips for
                # TIME — thousands of 2^26-product chunks through a
                # ~34 MB/s tunnel
                print(f"  {'spgemm':10s} skipped for time "
                      f"({products/1e6:.0f}M products; run "
                      f"benchmarks/spgemm_big.py for the streamed run)")
                out.append({"algorithm": "spgemm", "dataset": ds,
                            "skipped": f"{products} products: streamed "
                            "mode available (spgemm_big.py), skipped "
                            "for suite runtime"})
        except Exception as e:
            print(f"  {'spgemm':10s} FAILED: {type(e).__name__}: {e}")
            out.append({"algorithm": "spgemm", "dataset": ds,
                        "error": str(e)})

    # --- tc: host-phased chunk driver; single-dispatch timing, floor noted
    if not (skip and "tc" in skip):
        try:
            res = A.tc.run(csr, warmup=True)
            st = collect_stats("tc", ds, g, res.elapsed_ms, 1)
            rec = json.loads(st.to_json())
            rec["dispatch_floor_ms"] = floor
            rec["timing"] = "single-dispatch (host-phased chunks)"
            rec["triangles"] = res.total
            out.append(rec)
            print(f"  {'tc':10s} {res.elapsed_ms:10.3f} ms  "
                  f"({res.total} triangles)", flush=True)
        except Exception as e:
            print(f"  {'tc':10s} FAILED: {type(e).__name__}: {e}")
            out.append({"algorithm": "tc", "dataset": ds, "error": str(e)})
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("graphs", nargs="*",
                   default=["datasets/chesapeake.mtx"])
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--runs", type=int, default=4,
                   help="replay count R per timing cycle")
    p.add_argument("--out", default=None)
    p.add_argument("--skip", default="",
                   help="comma-separated algorithm names to skip")
    args = p.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    skip = {s for s in args.skip.split(",") if s}
    results = []

    def flush(rows):
        """Write after every row: a killed/timed-out run keeps its rows
        (compiles are disk-cached, so a rerun fast-forwards). Atomic
        temp-file + os.replace so a kill mid-write can't corrupt args.out."""
        if args.out:
            tmp = args.out + ".tmp"
            with open(tmp, "w") as f:
                json.dump(results + rows, f, indent=1)
            os.replace(tmp, args.out)

    for path in args.graphs:
        print(f"== {path} ==")
        results.extend(bench_graph(path, args.runs, skip,
                                   flush=flush if args.out else None))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
