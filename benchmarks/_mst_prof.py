"""Attribution of one MST Borůvka round at rmat20: edge-level
(expand/combine sweeps) vs vertex-level (per-component argmin + pointer
jumping) cost."""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from benchmarks.run_benchmarks import _load
from essentials_tpu.graph import build_graph
from essentials_tpu.algorithms import mst as M

R = 8


def main():
    spec = sys.argv[1] if len(sys.argv) > 1 else "gen:rmat20x16"
    csr, ds = _load(spec)
    g = build_graph(csr, directed=False, weighted=True)
    vp = g.n_vertices_padded
    ep = g.n_edges_padded
    INT_MAX = M.INT_MAX

    def edge_level(g, comp):
        iota_v = jnp.arange(vp, dtype=jnp.int32)
        comp_src = M._expand_by_src(g, (comp,))[0]
        comp_dst = M._expand_by_dst_to_csr(g, comp)
        cross = (comp_src != comp_dst) & g.edge_mask()
        wkey = jnp.where(cross, M._float_order_key(g.values), INT_MAX)
        wmin_v = M._combine_src_min(g, wkey)
        wmin_e = M._expand_by_src(g, (jnp.where(wmin_v == INT_MAX,
                                                INT_MAX - 1, wmin_v),))[0]
        at_min = cross & (wkey == wmin_e)
        dx = jnp.where(at_min, g.col_indices, INT_MAX)
        dmin_v = M._combine_src_min(g, dx)
        dmin_e = M._expand_by_src(g, (jnp.where(dmin_v == INT_MAX,
                                                INT_MAX - 1, dmin_v),))[0]
        eid = jnp.arange(ep, dtype=jnp.int32)
        ex = jnp.where(at_min & (g.col_indices == dmin_e), eid, INT_MAX)
        emin_v = M._combine_src_min(g, ex)
        return wmin_v, dmin_v, emin_v

    def vertex_level(g, comp, wmin_v, dmin_v, emin_v):
        iota_v = jnp.arange(vp, dtype=jnp.int32)
        has_cand = wmin_v < INT_MAX
        cu = jnp.minimum(iota_v, dmin_v)
        cv = jnp.maximum(iota_v, dmin_v)
        kw = dict(num_segments=vp, indices_are_sorted=False)
        wminc = jax.ops.segment_min(wmin_v, comp, **kw)
        at_w = has_cand & (wmin_v == wminc[comp])
        uminc = jax.ops.segment_min(jnp.where(at_w, cu, INT_MAX), comp,
                                    **kw)
        at_u = at_w & (cu == uminc[comp])
        vminc = jax.ops.segment_min(jnp.where(at_u, cv, INT_MAX), comp,
                                    **kw)
        at_v = at_u & (cv == vminc[comp])
        eminc = jax.ops.segment_min(jnp.where(at_v, emin_v, INT_MAX),
                                    comp, **kw)
        has_edge = eminc < INT_MAX
        safe_e = jnp.where(has_edge, eminc, 0)
        target = jnp.where(has_edge, comp[g.col_indices[safe_e]], iota_v)
        mutual = (target[target] == iota_v) & (iota_v < target)
        parent = jnp.where(mutual, iota_v, target)
        return parent

    def pointer_jump(g, parent, comp):
        depth = max(int(np.ceil(np.log2(max(vp, 2)))), 1) + 2

        def not_flat(c):
            p, i = c
            return jnp.any(p[p] != p) & (i < depth)

        parent, _ = jax.lax.while_loop(
            not_flat, lambda c: (c[0][c[0]], c[1] + 1),
            (parent, jnp.int32(0)))
        return parent[comp]

    comp0 = jnp.arange(vp, dtype=jnp.int32)

    def mk(stage):
        @jax.jit
        def f(g, comp):
            w, d, e = edge_level(g, comp)
            if stage == 0:
                return w + d + e
            parent = vertex_level(g, comp, w, d, e)
            if stage == 1:
                return parent
            return pointer_jump(g, parent, comp)

        @partial(jax.jit, static_argnums=(2,))
        def rep(g, comp, n):
            def body(i, c):
                out = f(g, c)
                # runtime-derived zero: XLA has no value-range analysis
                # on runtime data, so the body stays loop-variant
                z = jax.lax.shift_right_logical(
                    jnp.abs(out.ravel()[0]), 31).astype(jnp.int32)
                return c + z
            return jax.lax.fori_loop(0, n, body, comp).ravel()[0]
        return rep

    names = ["edge-level", "+vertex-level", "+pointer-jump"]
    prev = 0.0
    for stage in range(3):
        rep = mk(stage)

        def fetch(n):
            t0 = time.perf_counter()
            float(rep(g, comp0, n))
            return (time.perf_counter() - t0) * 1e3
        fetch(1); fetch(R)
        best = min(max((fetch(R) - fetch(1)) / (R - 1), 1e-6)
                   for _ in range(3))
        print(f"{names[stage]:14s}: {best:8.2f} ms  (+{best - prev:7.2f})",
              flush=True)
        prev = best


if __name__ == "__main__":
    main()
