"""Flagship benchmark: BFS MTEPS on an RMAT power-law graph (real chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: the whole BFS (init + while_loop to convergence) is replayed R
times from distinct high-degree sources inside ONE jitted fori_loop, and a
single scalar checksum is fetched at the end — this amortizes away both the
per-dispatch RPC latency of remote/tunneled TPU runtimes and the
device->host fetch cost, so the number is pure on-device algorithm time
(protocol parity with the reference's enact-loop-only timing,
framework/enactor.hxx:243-254). MTEPS = E / median-run-time over 7
measurement cycles; every cycle is persisted in the JSON (cycles_ms) and
the best cycle is reported alongside (least-contended-chip estimate on the
shared pool).

VARIANT-ROBUST (round-3 fix): round 2 hard-wired the 'hybrid' BFS path and
regressed the driver number 950 -> 371 MTEPS because hybrid's per-level
mode-switch machinery is ~5.7x slower than the pure fused edge-axis path on
this graph class (measured back-to-back: fused 3.6 ms/run, adaptive 7.4,
hybrid 20.5). Now every supported variant is probed with 2 warm cycles and
the FASTEST one is measured for the headline; all probe results are
persisted in the JSON ("variants").

vs_baseline is achieved / target where target = 70% of a hardware roofline
estimate (BASELINE.json: ">=70% of roofline MTEPS per chip"): a
level-synchronous sweep must touch ~10 bytes/edge/superstep from HBM.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

SCALE = 18
EDGE_FACTOR = 16
RUNS = 16
HBM_GBPS = 819.0          # TPU v5e
BYTES_PER_EDGE_PER_ITER = 10.0


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
                if variant == "phased":
                    dist, it = bfs.run_phased_levels(g, sources[i % RUNS],
                                                     max_it)
                    return acc + jnp.sum(dist[:256] % 97) + it, it
                if variant in ("fused", "fused8"):
                    from essentials_tpu.ops import fused_bfs as FB
                    lev, it, unreached = bfs.run_fused_levels(
                        g, sources[i % RUNS], max_it,
                        i8_carrier=(variant == "fused8"))
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
                return acc + jnp.sum(st.distances[:256] % 97) + it, it
            return jax.lax.fori_loop(
                0, R, one,
                (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)))
        return replay

    # candidate variants, fastest-expected first; adaptive is probed only
    # when the fused engine is unavailable (its first compile is ~10 min
    # cold — never pay that when a supported faster path exists)
    variants = (["fused8", "fused", "phased", "hybrid"]
                if bfs.fused_supported(g) else ["adaptive"])

    def make_timed(replay):
        def timed(R):
            t0 = time.perf_counter()
            acc, it = replay(g, sources, R)
            _ = int(acc)  # forces execution + sync through lazy runtimes
            return (time.perf_counter() - t0) * 1e3, int(it)
        return timed

    probe = {}
    timed_by_variant = {}
    for variant in variants:
        timed = make_timed(make_replay(variant))
        timed(1)                   # compile R=1 program
        timed(RUNS)                # compile R=RUNS program
        cyc = []
        for _ in range(2):
            t1, _ = timed(1)
            tR, it = timed(RUNS)
            cyc.append(max((tR - t1) / (RUNS - 1), 1e-6))
        probe[variant] = round(float(np.median(cyc)), 3)
        timed_by_variant[variant] = timed

    best_variant = min(probe, key=probe.get)
    timed = timed_by_variant[best_variant]

    # several measurement cycles, ALL persisted: the TPU pool's chip
    # assignment / co-tenancy swings per-cycle throughput up to ~2.5x.
    # The headline value is the MEDIAN cycle (robust to co-tenant spikes);
    # best is reported alongside as the least-contended estimate.
    cycles_ms = []
    iters = 0
    for _ in range(7):
        t1, _ = timed(1)           # fixed dispatch overhead
        tR, it = timed(RUNS)
        cycles_ms.append(max((tR - t1) / (RUNS - 1), 1e-6))
        iters = it

    med_ms = float(np.median(cycles_ms))
    best_ms = min(cycles_ms)
    mteps = (g.n_edges / 1e6) / (med_ms / 1e3)
    best_mteps = (g.n_edges / 1e6) / (best_ms / 1e3)
    roofline_mteps = (HBM_GBPS * 1e9 / BYTES_PER_EDGE_PER_ITER) \
        / max(iters, 1) / 1e6
    target = 0.70 * roofline_mteps

    # --- second BASELINE metric: SpMV GB/s per chip (fused chain) ---
    # weighted directed graph of the same class; SOL model 12 B/edge
    # (value + column + x-gather).
    n_v, n_e = g.n_vertices, g.n_edges
    spmv_fields = {}
    try:
        del g
        coo_w = generate.rmat(SCALE, EDGE_FACTOR, seed=3, undirected=False,
                              weighted=True)
        csr_w = Csr.from_coo(coo_w)
        gw = build_graph(csr_w, directed=True, weighted=True)
        from essentials_tpu.algorithms import spmv as spmv_mod
        fn = spmv_mod.spmv_fused if spmv_mod.fused_supported(gw) \
            else spmv_mod.spmv_pull
        wplan = (spmv_mod.windowed_plan(gw)
                 if spmv_mod.fused_supported(gw) else None)
        x0 = jax.random.uniform(jax.random.PRNGKey(0),
                                (gw.n_vertices_padded,), jnp.float32)

        @partial(jax.jit, static_argnums=(3,))
        def sreplay(gw, pl_, x, n):
            def body(i, x):
                y = spmv_mod.spmv_windowed(gw, pl_, x) \
                    if pl_ is not None else fn(gw, x)
                return x * 0.5 + y[:x.shape[0]] * 1e-9
            return jnp.sum(jax.lax.fori_loop(0, n, body, x).ravel()[:8])

        def sfetch(n):
            t0 = time.perf_counter()
            float(sreplay(gw, wplan, x0, n))
            return (time.perf_counter() - t0) * 1e3

        # spmv runs are ~0.5-1 ms at this scale: amortize over 64
        # replays so the (t_R - t_1) signal dominates the tunnel's
        # ~1-3 ms RTT jitter (R=16 measured 0.33-0.89 ms scatter)
        SRUNS = 64
        # probe windowed vs fused (windowed wins at tfbc scale, the
        # chain at wbc scale — measure, don't assume)
        cands = [None] + ([wplan] if wplan is not None else [])
        best_pl, best_probe = None, float("inf")
        for pl_ in cands:
            def sfetch_p(n, pl_=pl_):
                t0 = time.perf_counter()
                float(sreplay(gw, pl_, x0, n))
                return (time.perf_counter() - t0) * 1e3
            sfetch_p(1)
            sfetch_p(SRUNS)
            t1 = sfetch_p(1)
            tR = sfetch_p(SRUNS)
            pr = max((tR - t1) / (SRUNS - 1), 1e-6)
            if pr < best_probe:
                best_pl, best_probe = pl_, pr
        wplan = best_pl
        sfetch(1)
        scyc = []
        for _ in range(5):
            t1 = sfetch(1)
            tR = sfetch(SRUNS)
            scyc.append(max((tR - t1) / (SRUNS - 1), 1e-6))
        spmv_ms = float(np.median(scyc))
        sol_ms = csr_w.nnz * 12.0 / (HBM_GBPS * 1e9) * 1e3
        spmv_fields = {
            "spmv_variant": "windowed" if wplan is not None else "fused",
            "spmv_gbps": round(csr_w.nnz * 12.0 / spmv_ms / 1e6, 1),
            "spmv_ms": round(spmv_ms, 3),
            "spmv_pct_hbm_roofline": round(sol_ms / spmv_ms, 4),
        }
    except Exception as e:            # never lose the primary metric
        spmv_fields = {"spmv_error": f"{type(e).__name__}: {e}"[:200]}

    print(json.dumps({
        "metric": f"bfs_mteps_rmat{SCALE}ef{EDGE_FACTOR}",
        "value": round(mteps, 2),
        "unit": "MTEPS",
        "vs_baseline": round(mteps / target, 4),
        "best": round(best_mteps, 2),
        "variant": best_variant,
        "variants_probe_ms": probe,
        "cycles_ms": [round(c, 3) for c in cycles_ms],
        **spmv_fields,
    }))
    print(f"# med_ms={med_ms:.2f} best_ms={best_ms:.2f} iters_last={iters} "
          f"V={n_v} E={n_e} backend={jax.default_backend()} "
          f"roofline_mteps={roofline_mteps:.0f}", file=sys.stderr)


if __name__ == "__main__":
    main()
