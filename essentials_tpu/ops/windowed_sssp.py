"""Windowed SSSP: Bellman-Ford relaxation sweeps on the 3-kernel
windowed engine, with the distance state held in COMPACT rank space.

The fused 3-kernel sweep (ops/fused_sssp.py) keeps dist expanded on the
edge axis: each sweep reads + writes the [L] int32 state twice (~40
B/edge). Here the state is the compact per-vertex vector (CSC rank
space == CSR rank space on symmetric graphs): the sweep expands it with
the windowed dxc trick (VMEM-resident diff table), adds the edge weight
in f32, routes CSC->CSR, and segment-MINs into the compact output
(~27 B/edge):

  relax: cand[u] = min over out-edges (u,v) of dist[v] + w(u,v)
  (undirected graphs: relaxation by neighbors)

Distances ride as IEEE-754 float32 bit patterns in int32 (non-negative
floats compare identically — the fused_sssp trick), so the segmented MIN
and the improve-compare run on integer VPU paths.

Reference parity: gunrock::sssp
(/root/reference/include/gunrock/algorithms/sssp.hxx:110-151) at
whole-superstep level with deterministic MIN combines; the reference's
distance-bucketed advance was never built
(framework/operators/advance/bucketing.hxx:32-36).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from essentials_tpu.ops.windowed_spmv import (
    WindowedSpmvPlan, INF_BITS, compact_bits, windowed_pipeline,
    windowed_pipeline_ref, merge_compact)


def windowed_sssp_supported(g, plan) -> bool:
    return bool(plan is not None and g.symmetric_layout
                and jax.default_backend() == "tpu")


def _sweep(g, plan: WindowedSpmvPlan, dist_c: jax.Array, use_pallas: bool
           ) -> tuple:
    """One relaxation sweep in compact space. dist_c: int32[vp] f32 bit
    patterns (ranks >= n_cseg hold +inf). Returns (dist_c', improved
    count)."""
    dcf = jax.lax.bitcast_convert_type(dist_c, jnp.float32)
    if use_pallas:
        dxc2 = compact_bits(plan, dcf)
        priv = windowed_pipeline(g, plan, dxc2, message="add",
                                 reduce="min")
        yc = merge_compact(plan, priv, ident_bits=INF_BITS)[:plan.vp]
    else:
        yc = windowed_pipeline_ref(g, plan, dcf, message="add",
                                   reduce="min")[:plan.vp]
    improved = yc < dist_c                       # int order == f32 order
    out = jnp.where(improved, yc, dist_c)
    cnt = jnp.sum(improved.astype(jnp.int32))
    return out, cnt


def run_windowed_sssp(g, plan: WindowedSpmvPlan, source, max_it,
                      use_pallas: bool | None = None):
    """Whole SSSP as compact-space Bellman-Ford sweeps; convergence on
    improvement count == 0. Returns (dist f32[Vp], iterations)."""
    from essentials_tpu.ops.permute import apply_plan

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    vp = plan.vp
    src_rank = plan.y_src_rank[source]
    src_has_edges = plan.y_mask[source]
    d0 = jnp.full(vp, INF_BITS, jnp.int32)
    d0 = jnp.where((jnp.arange(vp) == src_rank) & src_has_edges,
                   jnp.int32(0), d0)

    if use_pallas:
        def cond(c):
            d, go, it = c
            return (it < max_it) & (go != 0)

        def body(c):
            d, go, it = c
            d2, cnt = _sweep(g, plan, d, use_pallas)
            return d2, cnt, it + 1

        d, _, it = jax.lax.while_loop(
            cond, body, (d0, jnp.int32(1), jnp.int32(0)))
    else:
        # the stage-exact ref algebra is host-staged (per-slab numpy
        # perms) and cannot trace inside lax.while_loop: python loop
        d, it = d0, jnp.int32(0)
        while int(it) < int(max_it):
            d, cnt = _sweep(g, plan, d, False)
            it = it + 1
            if int(cnt) == 0:
                break

    # collapse rank space -> vertex space
    y = apply_plan(d, plan.y_route)
    dist = jnp.where(plan.y_mask, y, jnp.int32(INF_BITS))
    dist = dist.at[source].min(0)                # isolated source
    return jax.lax.bitcast_convert_type(dist, jnp.float32)[:vp], it
