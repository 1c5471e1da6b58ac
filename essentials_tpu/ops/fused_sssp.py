"""Fused edge-axis SSSP superstep (symmetric graphs).

The fused BFS pipeline (ops/fused_bfs.py) generalizes from reachability to
shortest paths: distances live on the edge axis as IEEE-754 float32 BIT
PATTERNS in an int32 carrier — non-negative floats (+0.0 .. +inf) compare
identically as int32, so the forward fill and the suffix segmented MIN run
on the integer VPU paths the router already uses, with a single bitcast to
do the one real float op (dist + weight) inside K1:

  K1  fill dist bits from segment starts, d = f32(bits) + w, route head
  K2  route middle (unchanged cube kernels)
  K3  route tail, suffix segmented MIN (totals land at segment STARTS),
      improve-update at starts, improvement count

One Bellman-Ford relaxation sweep of ALL edges per superstep, three
kernels, convergence on improvement count == 0. Start-authoritative
contract identical to fused_bfs.fused_superstep2.

Reference parity: replaces the hot loop of
/root/reference/include/gunrock/algorithms/sssp.hxx:110-151 (atomicMin
relaxation) at whole-superstep level, with deterministic MIN combines.
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

INF_BITS = np.float32(np.inf).view(np.int32).item()   # 0x7f800000


def _suffix_segmin(z, end, carry_v):
    """Suffix (right-to-left) segmented MIN on int32 bit patterns of
    non-negative float32: s[p] = MIN of z[p..segment end]. ``end`` marks
    segment END positions; carry_v holds the suffix value at the first
    position of the block to the right."""
    rows = z.shape[0]
    zero = jnp.zeros((), jnp.int32)
    inf = jnp.full((), INF_BITS, jnp.int32)
    v = z
    f = end
    k = 1
    while k < LANES:
        vr = _shift_lanes_left(v, k, inf)
        fr = _shift_lanes_left(f, k, zero)
        v = jnp.minimum(v, jnp.where(f > 0, inf, vr))
        f = f | fr
        k *= 2
    rv = v[:, :1]                            # whole-row suffix aggregate
    rf = f[:, :1]
    pv = _shift_rows_left(rv, 1, inf)        # rows strictly below, excl.
    pf = _shift_rows_left(rf, 1, zero)
    k = 1
    while k < rows:
        vr = _shift_rows_left(pv, k, inf)
        fr = _shift_rows_left(pf, k, zero)
        pv = jnp.minimum(pv, jnp.where(pf > 0, inf, vr))
        pf = pf | fr
        k *= 2
    v = jnp.minimum(v, jnp.where(f > 0, inf, pv))
    f = f | pf
    v = jnp.minimum(v, jnp.where(f > 0, inf, carry_v[0]))
    carry_v[0] = v[:1, :1][0, 0]
    return v


def _k1_fill_addw_kernel(x_ref, f_ref, w_ref, i0_ref, i1_ref, o_ref,
                         carry_v):
    """K1: forward fill dist bits from starts, add edge weight in real
    float32, route head (gather c, transpose, gather b)."""
    from essentials_tpu.ops.cube_router import _g2

    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_v[0] = jnp.int32(INF_BITS)

    x3 = x_ref[0]                                         # [8, B, C] int32
    flat = x3.reshape(_MSLAB_ROWS, LANES)
    sflat = f_ref[...].astype(jnp.int32).reshape(_MSLAB_ROWS, LANES)
    fill = _fwd_fill_starts(flat, sflat, carry_v)
    d = jax.lax.bitcast_convert_type(fill, jnp.float32)
    w = w_ref[...].reshape(_MSLAB_ROWS, LANES)
    y = jax.lax.bitcast_convert_type(d + w, jnp.int32)
    y = y.reshape(x3.shape)
    y = _g2(y, i0_ref[...])
    y = jnp.swapaxes(y, 1, 2)                             # [8, C, B]
    y = _g2(y, i1_ref[...])
    o_ref[0] = jnp.swapaxes(y, 0, 1)                      # [C, 8, B]


def _k3_suffixmin_update_kernel(x_ref, i_ref, f_ref, dist_ref, odist_ref,
                                ocnt_ref, carry_v, carry_start):
    """K3: final gather, suffix segmented MIN (totals at segment STARTS),
    improve-update at starts, improvement count. DESCENDING grid."""
    from essentials_tpu.ops.cube_router import _g2

    @pl.when(pl.program_id(0) == 0)          # LAST physical block
    def _():
        carry_v[0] = jnp.int32(INF_BITS)
        carry_start[0] = jnp.int32(1)        # global last position is an end
        ocnt_ref[...] = jnp.zeros_like(ocnt_ref)

    x = x_ref[0]                                          # [C, 8, B]
    x = jnp.swapaxes(x, 0, 1)                             # [8, C, B]
    x = jnp.swapaxes(x, 1, 2)                             # [8, B, C]
    x = _g2(x, i_ref[...])
    z = x.reshape(_MSLAB_ROWS, LANES)
    start = f_ref[...].astype(jnp.int32).reshape(_MSLAB_ROWS, LANES)
    zero = jnp.zeros((), jnp.int32)
    # end(i) = start(i+1); block's last element takes the carried start bit
    end = _shift_lanes_left(start, 1, zero)
    nxt_row_start = _shift_rows_left(start[:, :1], 1, carry_start[0])
    lane = jax.lax.broadcasted_iota(jnp.int32, end.shape, 1)
    end = jnp.where(lane == LANES - 1, nxt_row_start, end)
    s = _suffix_segmin(z, end, carry_v)
    carry_start[0] = start[:1, :1][0, 0]

    dist = dist_ref[0].reshape(_MSLAB_ROWS, LANES)
    improved = (start > 0) & (s < dist)
    out = jnp.where(improved, s, dist)
    odist_ref[0] = out.reshape(x.shape)
    ocnt_ref[...] = ocnt_ref[...] + jnp.sum(improved.astype(jnp.int32))


def fused_sssp_superstep(g, dist_exp: jax.Array) -> tuple:
    """One Bellman-Ford sweep as THREE kernels. dist_exp is int32 [Ep]
    float32 bit patterns, start-authoritative. Returns
    (dist_exp', improved_count int32[1,1])."""
    from essentials_tpu.ops.cube_router import _plan_kparts, _MSLAB, \
        LANES as CL

    plan = g.route_fwd
    L = plan.length
    n = dist_exp.shape[0]

    def bs(shp, im):
        return pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)

    i0, i1, i6, k2_kernel, k2_idx = _plan_kparts(plan, bs)
    M = plan.wide if plan.form == "wbc" else plan.wide * CL
    G = M // _MSLAB
    x = dist_exp if n == L else jnp.pad(dist_exp, (0, L - n),
                                        constant_values=INF_BITS)
    xm = x.reshape(1, M, CL, CL)
    flags = g.csc_seg_flags.astype(jnp.int8)
    flags = (flags if n == L else jnp.pad(flags, (0, L - n),
                                          constant_values=1))
    fm = flags.reshape(M, CL, CL)
    w = g.values.astype(jnp.float32)
    w = w if n == L else jnp.pad(w, (0, L - n))
    wm = w.reshape(M, CL, CL)
    flag_spec = bs((_MSLAB, CL, CL), lambda m, p: (m, 0, 0))
    flag_spec_rev = bs((_MSLAB, CL, CL), lambda m, p: (G - 1 - m, 0, 0))

    k1 = pl.pallas_call(
        _k1_fill_addw_kernel, grid=(G, 1),
        in_specs=[bs((1, _MSLAB, CL, CL), lambda m, p: (p, m, 0, 0)),
                  flag_spec,
                  bs((_MSLAB, CL, CL), lambda m, p: (m, 0, 0)),
                  bs((_MSLAB, CL, CL), lambda m, p: (m, 0, 0)),
                  bs((_MSLAB, CL, CL), lambda m, p: (m, 0, 0))],
        out_specs=bs((1, CL, _MSLAB, CL), lambda m, p: (p, 0, m, 0)),
        out_shape=jax.ShapeDtypeStruct((1, CL, M, CL), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=_interp(),
    )(xm, fm, wm, i0, i1)

    vmem = (pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if plan.form == "tfbc" else None)
    k2 = pl.pallas_call(
        k2_kernel, grid=(CL, 1),
        in_specs=[bs((1, 1, M, CL), lambda c, p: (p, c, 0, 0))]
        + [spec for _, spec in k2_idx],
        out_specs=bs((1, 1, M, CL), lambda c, p: (p, c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, CL, M, CL), jnp.int32),
        compiler_params=vmem,
        interpret=_interp(),
    )(k1, *[a for a, _ in k2_idx])

    rev_in = bs((1, CL, _MSLAB, CL), lambda m, p: (p, 0, G - 1 - m, 0))
    rev_x = bs((1, _MSLAB, CL, CL), lambda m, p: (p, G - 1 - m, 0, 0))
    odist, ocnt = pl.pallas_call(
        _k3_suffixmin_update_kernel, grid=(G, 1),
        in_specs=[rev_in,
                  bs((_MSLAB, CL, CL), lambda m, p: (G - 1 - m, 0, 0)),
                  flag_spec_rev, rev_x],
        out_specs=[rev_x,
                   pl.BlockSpec((1, 1), lambda m, p: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, M, CL, CL), jnp.int32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32)],
        interpret=_interp(),
    )(k2, i6, fm, xm)
    return odist.reshape(L)[:n], ocnt


def fused_sssp_supported(g) -> bool:
    from essentials_tpu.ops import cube_router
    return bool(g.symmetric_layout and g.route_fwd is not None
                and g.off_route_csr is not None
                and isinstance(g.route_fwd, cube_router.CubePlan)
                and jax.default_backend() == "tpu" and not _INTERPRET)


def fused_sssp_superstep_ref(g, dist_exp: jax.Array) -> tuple:
    """Pure-XLA fallback (CPU tests / non-cube plans): identical contract,
    full-segment writes (a superset of start-authoritative)."""
    from essentials_tpu.ops.permute import apply_plan
    from essentials_tpu.ops.scan_kernels import segmented_scan
    flags = g.csc_seg_flags
    d_full = segmented_scan(dist_exp, flags, "first")
    d = jax.lax.bitcast_convert_type(d_full, jnp.float32)
    y = d + g.values.astype(jnp.float32)
    z = apply_plan(jax.lax.bitcast_convert_type(y, jnp.int32), g.route_fwd,
                   n_valid=g.n_edges_padded)
    n = z.shape[0]
    sid = jnp.cumsum(flags.astype(jnp.int32)) - flags[0].astype(jnp.int32)
    tot = jax.ops.segment_min(z, sid, num_segments=n)
    fill = tot[sid]
    improved = fill < d_full
    out = jnp.where(improved, fill, d_full)
    cnt = jnp.sum((improved & (flags != 0)).astype(jnp.int32)).reshape(1, 1)
    return out, cnt


def init_dist_exp(g, source) -> jax.Array:
    """dist_exp[p] = 0.0 bits where segment(p) == source else +inf bits."""
    o0 = g.row_offsets[source]
    o1 = g.row_offsets[jnp.asarray(source) + 1]
    p = jnp.arange(g.n_edges_padded, dtype=g.row_offsets.dtype)
    return jnp.where((p >= o0) & (p < o1), jnp.int32(0),
                     jnp.int32(INF_BITS))


def collapse_dist_exp(g, dist_exp: jax.Array, source) -> jax.Array:
    """dist_exp bits -> per-vertex float32 distances [Vp]; empty segments
    are +inf except the source itself."""
    from essentials_tpu.ops.permute import apply_plan
    from essentials_tpu.ops.scan_kernels import segmented_scan
    route = g.off_route_csr
    n_seg = route.n_seg
    picked = apply_plan(dist_exp, route.inv_plan, n_valid=n_seg + 1)
    ff = segmented_scan(picked, route.run_start, "first")
    seg_len = route.seg_len
    d_v = jnp.where(seg_len > 0, ff[:n_seg], jnp.int32(INF_BITS))
    d_v = d_v[:g.n_vertices_padded].at[source].min(0)
    return jax.lax.bitcast_convert_type(d_v, jnp.float32)


def run_fused_sssp(g, source, max_it):
    """Whole SSSP as Bellman-Ford sweeps on the edge axis: one fused
    3-kernel superstep per round, convergence on improvement count == 0.
    Returns (dist f32[Vp], iterations)."""
    step = (fused_sssp_superstep if fused_sssp_supported(g)
            else fused_sssp_superstep_ref)
    d0 = init_dist_exp(g, source)

    def cond(c):
        d, go, it = c
        return (it < max_it) & (go != 0)

    def body(c):
        d, go, it = c
        d2, cnt = step(g, d)
        return d2, cnt[0, 0], it + 1

    d, _, it = jax.lax.while_loop(
        cond, body, (d0, jnp.int32(1), jnp.int32(0)))
    return collapse_dist_exp(g, d, source), it
