"""A/B: PR / HITS / BC on the SpMV engine vs the generic engine (r5 #2).

Replay-protocol timing (benchmarks/replay.py) at gen:rmat20x16 by default.
Usage: python benchmarks/_ports_ab.py [gen:rmat18x16] [pr,hits,bc]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from benchmarks.run_benchmarks import _load
from benchmarks.replay import replay_ms, enact_body, guard
from essentials_tpu.graph import build_graph
from essentials_tpu import algorithms as A


def main():
    spec = sys.argv[1] if len(sys.argv) > 1 else "gen:rmat20x16"
    which = set((sys.argv[2] if len(sys.argv) > 2 else "pr,hits,bc")
                .split(","))
    csr, ds = _load(spec)
    g = build_graph(csr, directed=False, weighted=True)
    deg = np.diff(np.asarray(csr.row_offsets))
    sources = np.argsort(-deg)[:8].astype(np.int32)
    v1 = g.n_vertices + 1
    plan = A.pr.spmv_plan(g)
    print(f"{ds}: windowed plan {'OK' if plan is not None else 'none'}")

    if "pr" in which:
        st0 = A.pr.init(g)

        def pr_spmv_body(g, st, s):
            plan_, iw = st
            ranks, it = A.pr._run_spmv_compiled(
                g, plan_, guard(iw, s), 0.85, 1e-6, 500)
            return (ranks,), it

        ms, it, cyc = replay_ms(pr_spmv_body, g, (plan, st0.iweights),
                                sources, R=4)
        print(f"pr_spmv    {ms:9.2f} ms  it={it}  {cyc}")
        ms, it, cyc = replay_ms(
            enact_body(A.pr.step, A.pr.converged, v1), g, st0, sources,
            R=4)
        print(f"pr_generic {ms:9.2f} ms  it={it}  {cyc}")

    if "hits" in which:
        ones = jnp.ones(g.n_vertices_padded, jnp.float32)

        def hits_spmv_body(g, st, s):
            plan_, h0 = st
            auth, hub, it = A.hits._run_spmv_compiled(
                g, plan_, 50, guard(h0, s))
            return (auth, hub), it

        ms, it, cyc = replay_ms(hits_spmv_body, g, (plan, ones),
                                sources, R=4)
        print(f"hits_spmv  {ms:9.2f} ms  it={it}  {cyc}")
        ms, it, cyc = replay_ms(
            enact_body(A.hits.step, A.hits.converged, 50), g,
            A.hits.init(g), sources, R=4)
        print(f"hits_gen   {ms:9.2f} ms  it={it}  {cyc}")

    if "bc" in which:
        def bc_spmv_body(g, st, s):
            delta, depth, levels = A.bc._single_source_deps_spmv(
                g, st[0], s, v1)
            return (delta,), levels

        ms, it, cyc = replay_ms(bc_spmv_body, g, (plan,), sources, R=4)
        print(f"bc_spmv    {ms:9.2f} ms  it={it}  {cyc}")

        def bc_body(g, _, s):
            delta, depth, levels = A.bc._single_source_deps(g, s, v1)
            return (delta,), levels

        ms, it, cyc = replay_ms(bc_body, g, None, sources, R=4)
        print(f"bc_generic {ms:9.2f} ms  it={it}  {cyc}")


if __name__ == "__main__":
    main()
