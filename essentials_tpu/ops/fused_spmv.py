"""Fused SpMV: the whole y = A @ x edge-axis pipeline as ONE 7-kernel chain.

The generic path (algorithms/spmv.py:spmv_pull via ops/neighborreduce.py)
runs expand / route / multiply / segmented-sum / boundary-route as SEPARATE
fused groups with full HBM round trips of the [Ep] axis between them —
measured 9.2 ms at rmat20 (VERDICT r3 weak #2, 5% of HBM roofline). This
module chains all three routes with the glue fused into the route-boundary
kernels, exactly like ops/advance.py:advance_count does for BFS counts:

  K1   head of route A (CSC offsets plan: diffs -> segment-start slots)
  K2a  middle of route A
  Km1  tail of A + inclusive int32 telescoping scan (completes the expand:
       x_exp[q] = x[dst(q)], CSC order) + bitcast f32 + MULTIPLY by the
       static CSC-ordered weights + head of route B
  K2b  middle of route B (CSC -> CSR edge order)
  Km2  tail of B + segmented f32 SUM scan over the CSR segment flags
       (error stays per-segment — same contract as
       segment.combine_by_offsets_routed's float path) + shift-right-by-one
       (prefix_ex[k] = sv[k-1]) + head of route C
  K2c  middle of route C (inverse CSR offsets plan)
  K3   tail of route C: slot w receives prefix_ex[offsets[w]] = the
       per-source segment total

followed by vertex-axis-only cleanup (run forward-fill + empty-segment
mask). Zero inter-kernel HBM round trips of the edge axis beyond the
routes themselves.

Reference parity: gunrock::spmv via mgpu transform_segreduce
(/root/reference/include/gunrock/algorithms/spmv.hxx:106-126,
framework/operators/neighborreduce/neighborreduce.hxx:85-88) — mgpu's
segreduce is near-roofline on GPU; this is the TPU counterpart.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from essentials_tpu.ops.cube_router import (
    LANES, _MSLAB, _g2, _block_cumsum, _k1_kernel, _k3_kernel,
    _plan_kparts, chainable_n, _ref_apply)
from essentials_tpu.ops.scan_kernels import (_block_scan, _shift_lanes,
                                             _shift_rows)


def _km_scan_mul_kernel(unit, xa_ref, *rest):
    """Tail(route A) + inclusive telescoping scan + f32 multiply +
    head(route B), one m-slab. ``unit`` (static): skip the multiply and
    the [L] weight read (unweighted sums — HITS/BC)."""
    if unit:
        i6a_ref, i0b_ref, i1b_ref, o_ref, carry_ref = rest
    else:
        w_ref, i6a_ref, i0b_ref, i1b_ref, o_ref, carry_ref = rest
    x = xa_ref[0]                                         # [C, 8, B] int32
    x = jnp.swapaxes(x, 0, 1)                             # [8, C, B]
    x = jnp.swapaxes(x, 1, 2)                             # [8, B, C]
    x = _g2(x, i6a_ref[...])                              # finish route A
    x = _block_cumsum(x, carry_ref, False, False)         # int32 wraparound
    if not unit:
        xf = jax.lax.bitcast_convert_type(x, jnp.float32)  # x_exp (CSC)
        x = jax.lax.bitcast_convert_type(xf * w_ref[...], jnp.int32)
    x = _g2(x, i0b_ref[...])                              # start route B
    x = jnp.swapaxes(x, 1, 2)                             # [8, C, B]
    x = _g2(x, i1b_ref[...])
    o_ref[0] = jnp.swapaxes(x, 0, 1)                      # [C, 8, B]


def _km_segsum_shift_kernel(xb_ref, f_ref, i6b_ref, i0c_ref, i1c_ref,
                            o_ref, carry_v, carry_f, carry_last):
    """Tail(route B) + segmented f32 SUM scan + shift-right-by-one +
    head(route C), one m-slab (sequential grid carries link blocks)."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_v[0] = jnp.float32(0)
        carry_f[0] = jnp.int32(0)
        carry_last[0] = jnp.float32(0)

    x = xb_ref[0]                                         # [C, 8, B] int32
    x = jnp.swapaxes(x, 0, 1)
    x = jnp.swapaxes(x, 1, 2)                             # [8, B, C]
    x = _g2(x, i6b_ref[...])                              # finish route B
    v = jax.lax.bitcast_convert_type(
        x.reshape(_MSLAB * LANES, LANES), jnp.float32)    # products (CSR)
    f = f_ref[...].reshape(_MSLAB * LANES, LANES).astype(jnp.int32)
    sv, sf, (bv, bf) = _block_scan(v, f, jnp.add, jnp.float32(0), True)
    cv, cf = carry_v[0], carry_f[0]
    out = jnp.where(sf > 0, sv, sv + cv)                  # cross-block carry
    carry_v[0] = jnp.where(bf > 0, bv, cv + bv)
    carry_f[0] = bf | cf

    # shift right by one in flat element order: prefix_ex[k] = sv[k-1]
    last_col = out[:, LANES - 1:LANES]                    # [R, 1]
    prev_col = _shift_rows(last_col, 1, carry_last[0])
    sh = _shift_lanes(out, 1, jnp.float32(0))
    lane = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
    shifted = jnp.where(lane == 0, prev_col, sh)
    carry_last[0] = out[out.shape[0] - 1:, LANES - 1:][0, 0]

    x = jax.lax.bitcast_convert_type(shifted, jnp.int32) \
        .reshape(_MSLAB, LANES, LANES)
    x = _g2(x, i0c_ref[...])                              # start route C
    x = jnp.swapaxes(x, 1, 2)
    x = _g2(x, i1c_ref[...])
    o_ref[0] = jnp.swapaxes(x, 0, 1)


def fused_spmv_supported(g) -> bool:
    from essentials_tpu.ops.cube_router import CubePlan
    return (g.off_route_csc is not None and g.route_bwd is not None
            and g.off_route_csr is not None
            and isinstance(g.route_bwd, CubePlan)
            and chainable_n([g.off_route_csc.plan, g.route_bwd,
                             g.off_route_csr.inv_plan]))


def spmv_fused(g, x: jax.Array, *, use_pallas: bool | None = None,
               unit: bool = False) -> jax.Array:
    """y[s] = sum over CSR segment s of w[e] * x[dst[e]]; [Vp] output
    (0 at empty/pad segments). Requires fused_spmv_supported(g).
    unit=True: unweighted sum (skips the weight read)."""
    from essentials_tpu.ops.segment import _run_totals
    from essentials_tpu.ops.scan_kernels import segmented_scan

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    route_a = g.off_route_csc           # expand x over CSC offsets
    plan_b = g.route_bwd                # CSC -> CSR edge order
    route_c = g.off_route_csr           # boundary pick over CSR offsets
    plan_a, plan_c = route_a.plan, route_c.inv_plan
    L = plan_a.length
    ep = g.n_edges_padded
    n_seg = route_c.n_seg

    # vertex-axis prep: bit-diffs of x, pre-summed per offset run
    x = x.astype(jnp.float32)
    if x.shape[0] < route_a.n_seg:
        x = jnp.pad(x, (0, route_a.n_seg - x.shape[0]))
    iv = jax.lax.bitcast_convert_type(x, jnp.int32)
    d = jnp.diff(iv, prepend=jnp.zeros(1, jnp.int32))
    dd = _run_totals(d, route_a)
    dd = jnp.pad(dd, (0, L - dd.shape[0]))

    if unit:
        w = None
    else:
        w = g.csc_values.astype(jnp.float32)
        w = jnp.where(jnp.arange(ep) < g.n_edges, w, 0.0)  # zero pad edges
        w = jnp.pad(w, (0, L - ep))
    flags = g.csr_seg_flags.astype(jnp.int8)
    flags = jnp.pad(flags, (0, L - ep), constant_values=1)

    if not use_pallas:
        # reference algebra: same stages, pure jnp (CPU tests)
        v = _ref_apply(dd, plan_a)
        x_exp = jax.lax.bitcast_convert_type(jnp.cumsum(v), jnp.float32)
        prod = x_exp if unit else x_exp * w
        pr = jax.lax.bitcast_convert_type(
            _ref_apply(jax.lax.bitcast_convert_type(prod, jnp.int32),
                       plan_b), jnp.float32)
        sv = segmented_scan(pr, flags != 0, "add")
        shifted = jnp.concatenate([jnp.zeros(1, jnp.float32), sv[:-1]])
        picked = jax.lax.bitcast_convert_type(
            _ref_apply(jax.lax.bitcast_convert_type(shifted, jnp.int32),
                       plan_c), jnp.float32)[:n_seg + 1]
    else:
        picked = _pallas_spmv_chain(dd, w, flags, plan_a, plan_b, plan_c,
                                    n_seg, unit=unit)

    ff = segmented_scan(picked, route_c.run_start, "first")
    y = jnp.where(route_c.seg_len > 0, ff[1:], 0.0)
    return y[:g.n_vertices_padded]


def _pallas_spmv_chain(dd, w, flags, plan_a, plan_b, plan_c, n_seg,
                       stop_after: int = 7, unit: bool = False):
    """stop_after (profiling only): return the intermediate after the
    N-th kernel (1..7) bitcast to f32 — lets benchmarks time chain
    prefixes to locate hot kernels."""
    L = plan_a.length
    dt = jnp.int32

    def _stop(v, k):
        if stop_after == k:
            return jax.lax.bitcast_convert_type(
                v.reshape(-1)[:n_seg + 1], jnp.float32)
        return None

    def bs(shp, im):
        return pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)

    i0a, i1a, i6a, k2a_kernel, k2a_idx = _plan_kparts(plan_a, bs)
    i0b, i1b, i6b, k2b_kernel, k2b_idx = _plan_kparts(plan_b, bs)
    i0c, i1c, i6c, k2c_kernel, k2c_idx = _plan_kparts(plan_c, bs)
    M = plan_a.wide if plan_a.form == "wbc" else plan_a.wide * LANES
    G = M // _MSLAB
    vmem = (pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if plan_a.form == "tfbc" else None)

    def run_k2(v, k2_kernel, k2_idx):
        return pl.pallas_call(
            k2_kernel, grid=(LANES, 1),
            in_specs=[bs((1, 1, M, LANES), lambda c, p: (p, c, 0, 0))]
            + [spec for _, spec in k2_idx],
            out_specs=bs((1, 1, M, LANES), lambda c, p: (p, c, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, LANES, M, LANES), dt),
            compiler_params=vmem,
        )(v, *[a for a, _ in k2_idx])

    xm = dd.reshape(1, M, LANES, LANES)
    v = pl.pallas_call(
        partial(_k1_kernel, False, False), grid=(G, 1),
        in_specs=[bs((1, _MSLAB, LANES, LANES), lambda m, p: (p, m, 0, 0)),
                  bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0)),
                  bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0))],
        out_specs=bs((1, LANES, _MSLAB, LANES), lambda m, p: (p, 0, m, 0)),
        out_shape=jax.ShapeDtypeStruct((1, LANES, M, LANES), dt),
    )(xm, i0a, i1a)
    if (r := _stop(v, 1)) is not None:
        return r
    v = run_k2(v, k2a_kernel, k2a_idx)
    if (r := _stop(v, 2)) is not None:
        return r

    w_args = [] if unit else [w.reshape(M, LANES, LANES)]
    w_specs = [] if unit else [bs((_MSLAB, LANES, LANES),
                               lambda m, p: (m, 0, 0))]
    v = pl.pallas_call(
        partial(_km_scan_mul_kernel, unit), grid=(G, 1),
        in_specs=[bs((1, LANES, _MSLAB, LANES), lambda m, p: (p, 0, m, 0))]
        + w_specs
        + [bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0)),
           bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0)),
           bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0))],
        out_specs=bs((1, LANES, _MSLAB, LANES), lambda m, p: (p, 0, m, 0)),
        out_shape=jax.ShapeDtypeStruct((1, LANES, M, LANES), dt),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(v, *w_args, i6a, i0b, i1b)
    if (r := _stop(v, 3)) is not None:
        return r
    v = run_k2(v, k2b_kernel, k2b_idx)
    if (r := _stop(v, 4)) is not None:
        return r

    fm = flags.reshape(M, LANES, LANES)
    v = pl.pallas_call(
        _km_segsum_shift_kernel, grid=(G, 1),
        in_specs=[bs((1, LANES, _MSLAB, LANES), lambda m, p: (p, 0, m, 0)),
                  bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0)),
                  bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0)),
                  bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0)),
                  bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0))],
        out_specs=bs((1, LANES, _MSLAB, LANES), lambda m, p: (p, 0, m, 0)),
        out_shape=jax.ShapeDtypeStruct((1, LANES, M, LANES), dt),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.SMEM((1,), jnp.float32)],
    )(v, fm, i6b, i0c, i1c)
    if (r := _stop(v, 5)) is not None:
        return r
    v = run_k2(v, k2c_kernel, k2c_idx)
    if (r := _stop(v, 6)) is not None:
        return r

    v = pl.pallas_call(
        partial(_k3_kernel, False, False), grid=(G, 1),
        in_specs=[bs((1, LANES, _MSLAB, LANES), lambda m, p: (p, 0, m, 0)),
                  bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0))],
        out_specs=bs((1, _MSLAB, LANES, LANES), lambda m, p: (p, m, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, M, LANES, LANES), dt),
    )(v, i6c)
    out = v.reshape(L)[:n_seg + 1]
    return jax.lax.bitcast_convert_type(out, jnp.float32)
