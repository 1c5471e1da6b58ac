"""Fused edge-axis k-core peeling (symmetric graphs).

The generic peeling sweep runs the 7-kernel dense advance per wave
(algorithms/kcore.py, measured ~20 ms/wave at rmat20 -> 2.7 s total).
This pipeline does one wave in THREE kernels on the edge axis:

  K1  fill degree state from segment starts (-1 = peeled/dead), compute
      the peel predicate y = (0 <= deg < k), route head
  K2  route middle (unchanged cube kernels)
  K3  route tail, suffix segmented SUM (per-dst peeled-neighbor counts at
      segment STARTS), then at starts: peel -> core = k-1, deg = -1;
      survivors: deg -= count; accumulate (peeled count, min alive degree)

The k schedule makes every sweep productive: peels at level k exist iff
min-alive-degree < k, so after each wave
    k' = k                 if min_alive < k   (more waves at this level)
    k' = min_alive + 1     otherwise          (jump past empty levels)
and the loop ends when min_alive is the int32 max (nothing alive). This
subsumes the vertex-axis version's k-jump without its per-round O(V)
pre-reduces or wasted empty sweeps.

Degree-0 vertices own no edge positions and never affect neighbors; the
collapse assigns them core 0 (they peel at the first level).

Reference parity: gunrock::kcore
(/root/reference/include/gunrock/algorithms/kcore.hxx:148-199) at
whole-wave level with deterministic SUM combines.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from essentials_tpu.ops.fused_bfs import (
    LANES, _MSLAB_ROWS, _INTERPRET, _interp, _fwd_fill_starts, _shift_lanes_left,
    _shift_rows_left)

IMAX = np.iinfo(np.int32).max


def _suffix_segsum(z, end, carry_v):
    """Suffix (right-to-left) segmented SUM: s[p] = sum of
    z[p..segment end]. ``end`` marks segment END positions; carry_v holds
    the suffix value at the first position of the block to the right."""
    rows = z.shape[0]
    zero = jnp.zeros((), jnp.int32)
    v = z
    f = end
    k = 1
    while k < LANES:
        vr = _shift_lanes_left(v, k, zero)
        fr = _shift_lanes_left(f, k, zero)
        v = v + jnp.where(f > 0, zero, vr)
        f = f | fr
        k *= 2
    rv = v[:, :1]
    rf = f[:, :1]
    pv = _shift_rows_left(rv, 1, zero)
    pf = _shift_rows_left(rf, 1, zero)
    k = 1
    while k < rows:
        vr = _shift_rows_left(pv, k, zero)
        fr = _shift_rows_left(pf, k, zero)
        pv = pv + jnp.where(pf > 0, zero, vr)
        pf = pf | fr
        k *= 2
    v = v + jnp.where(f > 0, zero, pv)
    f = f | pf
    v = v + jnp.where(f > 0, zero, carry_v[0])
    carry_v[0] = v[:1, :1][0, 0]
    return v


def _k1_fill_peel_kernel(k_ref, x_ref, f_ref, i0_ref, i1_ref, o_ref,
                         carry_v):
    """K1: fill degree state from starts, y = (0 <= deg < k), route head."""
    from essentials_tpu.ops.cube_router import _g2

    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_v[0] = jnp.int32(-1)

    x3 = x_ref[0]                                         # [8, B, C] int32
    flat = x3.reshape(_MSLAB_ROWS, LANES)
    sflat = f_ref[...].astype(jnp.int32).reshape(_MSLAB_ROWS, LANES)
    fill = _fwd_fill_starts(flat, sflat, carry_v)
    kk = k_ref[0, 0]
    y = ((fill >= 0) & (fill < kk)).astype(jnp.int32)
    y = y.reshape(x3.shape)
    y = _g2(y, i0_ref[...])
    y = jnp.swapaxes(y, 1, 2)                             # [8, C, B]
    y = _g2(y, i1_ref[...])
    o_ref[0] = jnp.swapaxes(y, 0, 1)                      # [C, 8, B]


def _k3_suffixsum_update_kernel(x_ref, i_ref, f_ref, d_ref, c_ref, k_ref,
                                od_ref, oc_ref, ocnt_ref, omin_ref,
                                carry_v, carry_start):
    """K3: final gather, suffix segmented SUM, peel/core/degree update at
    starts, (peeled count, min alive degree) scalars. DESCENDING grid."""
    from essentials_tpu.ops.cube_router import _g2

    @pl.when(pl.program_id(0) == 0)          # LAST physical block
    def _():
        carry_v[0] = jnp.int32(0)
        carry_start[0] = jnp.int32(1)
        ocnt_ref[...] = jnp.zeros_like(ocnt_ref)
        omin_ref[...] = jnp.full_like(omin_ref, IMAX)

    x = x_ref[0]                                          # [C, 8, B]
    x = jnp.swapaxes(x, 0, 1)
    x = jnp.swapaxes(x, 1, 2)                             # [8, B, C]
    x = _g2(x, i_ref[...])
    z = x.reshape(_MSLAB_ROWS, LANES)
    start = f_ref[...].astype(jnp.int32).reshape(_MSLAB_ROWS, LANES)
    zero = jnp.zeros((), jnp.int32)
    end = _shift_lanes_left(start, 1, zero)
    nxt_row_start = _shift_rows_left(start[:, :1], 1, carry_start[0])
    lane = jax.lax.broadcasted_iota(jnp.int32, end.shape, 1)
    end = jnp.where(lane == LANES - 1, nxt_row_start, end)
    s = _suffix_segsum(z, end, carry_v)
    carry_start[0] = start[:1, :1][0, 0]

    deg = d_ref[0].reshape(_MSLAB_ROWS, LANES)
    core = c_ref[0].reshape(_MSLAB_ROWS, LANES)
    kk = k_ref[0, 0]
    at_start = start > 0
    peeled = at_start & (deg >= 0) & (deg < kk)
    survivor = at_start & (deg >= 0) & ~peeled
    deg2 = jnp.where(peeled, jnp.int32(-1),
                     jnp.where(survivor, deg - s, deg))
    core2 = jnp.where(peeled, kk - 1, core)
    od_ref[0] = deg2.reshape(x.shape)
    oc_ref[0] = core2.reshape(x.shape)
    ocnt_ref[...] = ocnt_ref[...] + jnp.sum(peeled.astype(jnp.int32))
    alive_deg = jnp.where(survivor, deg2, IMAX)
    omin_ref[...] = jnp.minimum(omin_ref[...], jnp.min(alive_deg))


def fused_kcore_sweep(g, deg_exp, core_exp, k):
    """One peel wave as THREE kernels. Returns
    (deg_exp', core_exp', peeled_count[1,1], min_alive_deg[1,1])."""
    from essentials_tpu.ops.cube_router import _plan_kparts, _MSLAB, \
        LANES as CL

    plan = g.route_fwd
    L = plan.length
    n = deg_exp.shape[0]

    def bs(shp, im):
        return pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)

    i0, i1, i6, k2_kernel, k2_idx = _plan_kparts(plan, bs)
    M = plan.wide if plan.form == "wbc" else plan.wide * CL
    G = M // _MSLAB
    x = deg_exp if n == L else jnp.pad(deg_exp, (0, L - n),
                                       constant_values=-1)
    c = core_exp if n == L else jnp.pad(core_exp, (0, L - n))
    xm = x.reshape(1, M, CL, CL)
    cm = c.reshape(1, M, CL, CL)
    flags = g.csc_seg_flags.astype(jnp.int8)
    flags = (flags if n == L else jnp.pad(flags, (0, L - n),
                                          constant_values=1))
    fm = flags.reshape(M, CL, CL)
    k_s = jnp.asarray(k, jnp.int32).reshape(1, 1)
    flag_spec = bs((_MSLAB, CL, CL), lambda m, p: (m, 0, 0))
    flag_spec_rev = bs((_MSLAB, CL, CL), lambda m, p: (G - 1 - m, 0, 0))

    k1 = pl.pallas_call(
        _k1_fill_peel_kernel, grid=(G, 1),
        in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                  bs((1, _MSLAB, CL, CL), lambda m, p: (p, m, 0, 0)),
                  flag_spec,
                  bs((_MSLAB, CL, CL), lambda m, p: (m, 0, 0)),
                  bs((_MSLAB, CL, CL), lambda m, p: (m, 0, 0))],
        out_specs=bs((1, CL, _MSLAB, CL), lambda m, p: (p, 0, m, 0)),
        out_shape=jax.ShapeDtypeStruct((1, CL, M, CL), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=_interp(),
    )(k_s, xm, fm, i0, i1)

    vmem = (pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if plan.form == "tfbc" else None)
    k2 = pl.pallas_call(
        k2_kernel, grid=(CL, 1),
        in_specs=[bs((1, 1, M, CL), lambda cc, p: (p, cc, 0, 0))]
        + [spec for _, spec in k2_idx],
        out_specs=bs((1, 1, M, CL), lambda cc, p: (p, cc, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, CL, M, CL), jnp.int32),
        compiler_params=vmem,
        interpret=_interp(),
    )(k1, *[a for a, _ in k2_idx])

    rev_in = bs((1, CL, _MSLAB, CL), lambda m, p: (p, 0, G - 1 - m, 0))
    rev_x = bs((1, _MSLAB, CL, CL), lambda m, p: (p, G - 1 - m, 0, 0))
    scalar_out = pl.BlockSpec((1, 1), lambda m, p: (0, 0),
                              memory_space=pltpu.VMEM)
    od, oc, ocnt, omin = pl.pallas_call(
        _k3_suffixsum_update_kernel, grid=(G, 1),
        in_specs=[rev_in,
                  bs((_MSLAB, CL, CL), lambda m, p: (G - 1 - m, 0, 0)),
                  flag_spec_rev, rev_x, rev_x,
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=[rev_x, rev_x, scalar_out, scalar_out],
        out_shape=[jax.ShapeDtypeStruct((1, M, CL, CL), jnp.int32),
                   jax.ShapeDtypeStruct((1, M, CL, CL), jnp.int32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32)],
        interpret=_interp(),
    )(k2, i6, fm, xm, cm, k_s)
    return od.reshape(L)[:n], oc.reshape(L)[:n], ocnt, omin


def fused_kcore_supported(g) -> bool:
    from essentials_tpu.ops import cube_router
    return bool(g.symmetric_layout and g.route_fwd is not None
                and g.off_route_csr is not None
                and isinstance(g.route_fwd, cube_router.CubePlan)
                and jax.default_backend() == "tpu" and not _INTERPRET)


def fused_kcore_sweep_ref(g, deg_exp, core_exp, k):
    """Pure-XLA fallback: identical contract, full-segment writes."""
    from essentials_tpu.ops.permute import apply_plan
    from essentials_tpu.ops.scan_kernels import segmented_scan
    flags = g.csc_seg_flags
    deg_full = segmented_scan(deg_exp, flags, "first")
    core_full = segmented_scan(core_exp, flags, "first")
    y = ((deg_full >= 0) & (deg_full < k)).astype(jnp.int32)
    z = apply_plan(y, g.route_fwd, n_valid=g.n_edges_padded)
    n = z.shape[0]
    sid = jnp.cumsum(flags.astype(jnp.int32)) - flags[0].astype(jnp.int32)
    tot = jax.ops.segment_sum(z, sid, num_segments=n)
    cnt_nbrs = tot[sid]
    peeled = (deg_full >= 0) & (deg_full < k)
    survivor = (deg_full >= 0) & ~peeled
    deg2 = jnp.where(peeled, -1,
                     jnp.where(survivor, deg_full - cnt_nbrs, deg_full))
    core2 = jnp.where(peeled, k - 1, core_full)
    at_start = flags != 0
    cnt = jnp.sum((peeled & at_start).astype(jnp.int32)).reshape(1, 1)
    malive = jnp.min(jnp.where(survivor & at_start, deg2, IMAX)
                     ).reshape(1, 1)
    return deg2, core2, cnt, malive


def init_deg_exp(g):
    """deg_exp[p] = out-degree of segment(p) (-1 on pad rows)."""
    from essentials_tpu.ops.segment import expand_vertex_to_edges
    deg = jnp.where(g.vertex_mask(), g.out_degrees(), -1).astype(jnp.int32)
    return expand_vertex_to_edges(deg, g.row_offsets, g.n_edges_padded)


def collapse_core_exp(g, core_exp) -> jax.Array:
    """core_exp -> per-vertex core numbers [Vp] (empty segments -> 0)."""
    from essentials_tpu.ops.permute import apply_plan
    from essentials_tpu.ops.scan_kernels import segmented_scan
    route = g.off_route_csr
    n_seg = route.n_seg
    picked = apply_plan(core_exp, route.inv_plan, n_valid=n_seg + 1)
    ff = segmented_scan(picked, route.run_start, "first")
    core_v = jnp.where(route.seg_len > 0, ff[:n_seg], 0)
    return core_v[:g.n_vertices_padded]


def run_fused_kcore(g, max_it):
    """Whole k-core decomposition on the edge axis. Returns
    (core int32[Vp], sweeps)."""
    sweep = (fused_kcore_sweep if fused_kcore_supported(g)
             else fused_kcore_sweep_ref)
    d0 = init_deg_exp(g)
    c0 = jnp.zeros_like(d0)
    # first level: min alive degree + 1 (every sweep is productive)
    flags = g.csc_seg_flags
    start_deg = jnp.where((flags != 0) & (d0 >= 0), d0, IMAX)
    k0 = jnp.minimum(jnp.min(start_deg) + 1, IMAX)

    def cond(c):
        d, cr, k, it = c
        return (it < max_it) & (k < IMAX)

    def body(c):
        d, cr, k, it = c
        d2, c2, cnt, malive = sweep(g, d, cr, k)
        ma = malive[0, 0]
        k2 = jnp.where(ma < k, k, jnp.where(ma == IMAX, IMAX, ma + 1))
        return d2, c2, k2, it + 1

    d, cr, _, it = jax.lax.while_loop(
        cond, body, (d0, c0, k0.astype(jnp.int32), jnp.int32(0)))
    return collapse_core_exp(g, cr), it
