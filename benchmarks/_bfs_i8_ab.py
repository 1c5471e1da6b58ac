"""A/B on chip: fused BFS level with int32 vs int8 inter-kernel carrier
(rmat18ef16, flagship protocol) + exact distance parity between the two."""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

RUNS = 16


def main():
    from essentials_tpu.formats import Csr
    from essentials_tpu.graph import build_graph
    from essentials_tpu.io import generate
    from essentials_tpu.algorithms import bfs

    coo = generate.rmat(18, 16, seed=1, undirected=True, weighted=False)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=False)
    sources = jnp.asarray(
        np.argsort(-np.diff(csr.row_offsets))[:RUNS].astype(np.int32))
    max_it = 64
    print(f"built E={g.n_edges}", flush=True)

    # parity: same distances bit-for-bit
    d32, _ = bfs._run_fused_compiled(g, int(sources[0]), max_it, False)
    d8, _ = bfs._run_fused_compiled(g, int(sources[0]), max_it, True)
    same = bool(jnp.array_equal(d32, d8))
    ref = bfs.cpu_reference(csr, int(sources[0]))
    okref = bool(np.array_equal(np.asarray(d32)[:csr.n_rows], ref))
    print(f"i8==i32: {same}  vs host: {okref}", flush=True)
    assert same and okref

    def make_replay(i8):
        @partial(jax.jit, static_argnums=(2,))
        def replay(g, sources, R):
            def one(i, carry):
                acc, _ = carry
                from essentials_tpu.ops import fused_bfs as FB
                lev, it, unreached = bfs.run_fused_levels(
                    g, sources[i % RUNS], max_it, i8_carrier=i8)
                dist = FB.collapse_lev_exp(g, lev, sources[i % RUNS],
                                           unreached)
                return acc + jnp.sum(dist[:256] % 97) + it, it
            return jax.lax.fori_loop(
                0, R, one, (jnp.asarray(0, jnp.int32),
                            jnp.asarray(0, jnp.int32)))
        return replay

    for name, i8 in (("fused-i32", False), ("fused-i8", True)):
        replay = make_replay(i8)

        def timed(R):
            t0 = time.perf_counter()
            acc, it = replay(g, sources, R)
            _ = int(acc)
            return (time.perf_counter() - t0) * 1e3

        timed(1)
        timed(RUNS)
        cyc = []
        for _ in range(4):
            t1 = timed(1)
            tR = timed(RUNS)
            cyc.append(max((tR - t1) / (RUNS - 1), 1e-6))
        ms = float(np.median(cyc))
        print(f"{name:10s} {ms:7.3f} ms/run  "
              f"{g.n_edges / 1e6 / (ms / 1e3):7.0f} MTEPS  cycles="
              f"{[round(c, 2) for c in cyc]}", flush=True)


if __name__ == "__main__":
    main()
