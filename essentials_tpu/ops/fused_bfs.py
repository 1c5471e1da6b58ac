"""Fused edge-axis BFS superstep (symmetric graphs).

The standard dense superstep (ops/advance.py:advance_count) moves the
frontier vertex->edges->vertex every level: expand over the CSR offsets
route, route CSR->CSC, combine back over the CSC offsets route — a
7-kernel chain. For SYMMETRIC graphs (csc_offsets == row_offsets) the
vertex<->edge moves CANCEL across supersteps: an array indexed by
"segment of position" means the same thing on both axes, so BFS state can
live directly on the edge axis as ``lev_exp[p] = level[segment(p)]``:

  y = (lev_exp == it)            elementwise          [Ep]
  z = route_fwd(y)               3 kernels            z[q] = frontier[src(q)]
  S = segmented_sum_scan(z)      1 kernel             per-dst running count
  lev' = suffix_fill_update(S)   1 kernel (backward)  newly -> level it+1

5 passes/level instead of 7 + vertex-axis pre/post, and no expand/collapse
inside the loop at all. The suffix kernel broadcasts each segment's total
(its value at the segment END) to every position by scanning right-to-left
with a descending grid, computes ``newly = (count>0) & unreached``, writes
the level update in place, and accumulates a per-call any-newly flag.

Reference parity: this replaces the hot loop of bfs.hxx:110-178 at the
whole-superstep level.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_ROWS = 1024
_INTERPRET = False


def _interp():
    """Interpret Pallas kernels when not on TPU (or when tests force it).

    Reading the backend at TRACE time makes kernel modules order-independent
    under pytest: the old module-level flag was mutated by test imports,
    so whether a CPU run crashed depended on which test file imported
    first (the r3 test_bitmap_tc flake class)."""
    return _INTERPRET or jax.default_backend() != "tpu"

UNREACHED = np.iinfo(np.int32).max


def _shift_lanes_left(x, k, fill):
    """Shift left by k along lanes (pull values from higher indices)."""
    r = pltpu.roll(x, LANES - k, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= LANES - k, fill, r)


def _shift_rows_left(x, k, fill):
    rows = x.shape[0]
    r = pltpu.roll(x, rows - k, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row >= rows - k, fill, r)


def _suffix_fill_update_kernel(s_ref, f_ref, lev_ref, it_ref,
                               olev_ref, oany_ref,
                               carry_v, carry_start):
    """One (descending-order) block: suffix-first fill of segment totals +
    level update.

    f_ref holds segment-START flags; a position's segment END is the slot
    before the next start (end(i) = start(i+1), with the carry supplying
    the next block's first start; the global last position is an end).
    carry_v holds the fill value at the first position of the block to the
    right — always defined because scanning starts at the global end.
    """
    rows = s_ref.shape[0]
    zero = jnp.zeros((), jnp.int32)

    @pl.when(pl.program_id(0) == 0)          # LAST physical block
    def _():
        carry_v[0] = zero
        carry_start[0] = jnp.int32(1)        # global last position is an end
        oany_ref[...] = jnp.zeros_like(oany_ref)

    zero8 = jnp.zeros((), s_ref.dtype)
    s = s_ref[:, :]                          # 0/1 (segmented OR scan out)
    start = f_ref[:, :].astype(s.dtype)      # flags as the value dtype
    # end(i) = start(i+1); the block's last element takes the carried bit
    end = _shift_lanes_left(start, 1, zero8)
    nxt_row_start = _shift_rows_left(start[:, :1], 1,
                                     carry_start[0].astype(jnp.int8))
    lane = jax.lax.broadcasted_iota(jnp.int32, end.shape, 1)
    end = jnp.where(lane == LANES - 1, nxt_row_start, end)

    # suffix "first" scan on int8 pairs: (v, f)[i] = nearest in-block
    # end >= i (int8 runs ~4x the int32 VPU rate)
    v = jnp.where(end > 0, s, zero8)
    f = end
    k = 1
    while k < LANES:
        vr = _shift_lanes_left(v, k, zero8)
        fr = _shift_lanes_left(f, k, zero8)
        v = jnp.where(f > 0, v, vr)
        f = f | fr
        k *= 2
    rv = v[:, :1]                            # per-row whole-row suffix pair
    rf = f[:, :1]
    pv = _shift_rows_left(rv, 1, zero8)      # suffix over LOWER rows excl.
    pf = _shift_rows_left(rf, 1, zero8)
    k = 1
    while k < rows:
        vr = _shift_rows_left(pv, k, zero8)
        fr = _shift_rows_left(pf, k, zero8)
        pv = jnp.where(pf > 0, pv, vr)
        pf = pf | fr
        k *= 2
    v = jnp.where(f > 0, v, pv)
    f = f | pf
    cv = carry_v[0].astype(jnp.int8)
    fill = jnp.where(f > 0, v, cv)           # cross-block completion
    # Mosaic extracts 32-bit scalars only: widen the corner blocks first
    f00 = f[:1, :1].astype(jnp.int32)[0, 0]
    v00 = v[:1, :1].astype(jnp.int32)[0, 0]
    carry_v[0] = jnp.where(f00 > 0, v00, carry_v[0])
    carry_start[0] = start[:1, :1].astype(jnp.int32)[0, 0]

    lev = lev_ref[:, :]
    it = it_ref[0, 0]
    newly = (fill > 0) & (lev == UNREACHED)
    olev_ref[:, :] = jnp.where(newly, it, lev)
    oany_ref[...] = oany_ref[...] | jnp.any(newly).astype(jnp.int32)


def suffix_fill_update(S: jax.Array, start_flags: jax.Array,
                       lev: jax.Array, it) -> tuple:
    """(new lev_exp, any_newly int32[1,1]). All inputs [Ep]."""
    n = S.shape[0]
    rows = pl.cdiv(n, LANES)
    brows = min(_ROWS, rows)
    grid = pl.cdiv(rows, brows)
    np_ = grid * brows * LANES
    S = S.astype(jnp.int32)   # i8 lane rolls unsupported by Mosaic (v5e)
    if np_ != n:
        S = jnp.pad(S, (0, np_ - n))
        start_flags = jnp.pad(start_flags.astype(jnp.int8),
                              (0, np_ - n), constant_values=1)
        lev = jnp.pad(lev, (0, np_ - n), constant_values=0)  # pad: reached
    s2 = S.reshape(-1, LANES)
    f2 = start_flags.astype(jnp.int8).reshape(-1, LANES)
    l2 = lev.reshape(-1, LANES)
    rev = pl.BlockSpec((brows, LANES), lambda i: (grid - 1 - i, 0),
                       memory_space=pltpu.VMEM)
    olev, oany = pl.pallas_call(
        _suffix_fill_update_kernel,
        grid=(grid,),
        in_specs=[rev, rev, rev,
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=[rev,
                   pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct(l2.shape, jnp.int32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32)],
        interpret=_interp(),
    )(s2, f2, l2, jnp.asarray(it, jnp.int32).reshape(1, 1))
    return olev.reshape(-1)[:n], oany


def _k1_eq_kernel(it_ref, x_ref, i0_ref, i1_ref, o_ref):
    """K1 with the frontier compare fused: y = (lev == it), gather c,
    transpose, gather b (cube_router K1 semantics, P=1)."""
    from essentials_tpu.ops.cube_router import _g2
    x = (x_ref[0] == it_ref[0, 0]).astype(jnp.int32)      # [8, B, C]
    x = _g2(x, i0_ref[...])
    x = jnp.swapaxes(x, 1, 2)                             # [8, C, B]
    x = _g2(x, i1_ref[...])
    o_ref[0] = jnp.swapaxes(x, 0, 1)                      # [C, 8, B]


def _k3_segor_kernel(x_ref, i_ref, f_ref, o_ref, carry_v, carry_f):
    """K3 with a segmented-OR (max) scan fused after the final gather."""
    from essentials_tpu.ops.cube_router import _g2
    from essentials_tpu.ops.scan_kernels import _block_scan

    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_v[0] = jnp.int32(0)
        carry_f[0] = jnp.int32(0)

    x = x_ref[0]                                          # [C, 8, B]
    x = jnp.swapaxes(x, 0, 1)                             # [8, C, B]
    x = jnp.swapaxes(x, 1, 2)                             # [8, B, C]
    x = _g2(x, i_ref[...])
    v = x.reshape(-1, LANES)                              # flat elem order
    f = f_ref[...].reshape(-1, LANES).astype(jnp.int32)
    sv, sf, (bv, bf) = _block_scan(v, f, jnp.maximum, jnp.int32(0), True)
    cv, cf = carry_v[0], carry_f[0]
    out = jnp.where(sf > 0, sv, jnp.maximum(cv, sv))
    carry_v[0] = jnp.where(bf > 0, bv, jnp.maximum(cv, bv))
    carry_f[0] = bf | cf
    o_ref[0] = out.reshape(x.shape)


def _suffix_pairs(s, start, carry_v, carry_start, zero):
    """Shared suffix-first machinery: fill every position with its
    segment's value at the segment END (s must hold per-segment totals at
    segment ends, e.g. an inclusive segmented scan). Returns fill and
    updates the carries. Works for any 32-bit dtype."""
    rows = s.shape[0]
    end = _shift_lanes_left(start, 1, jnp.zeros((), start.dtype))
    nxt_row_start = _shift_rows_left(start[:, :1], 1,
                                     carry_start[0].astype(start.dtype))
    lane = jax.lax.broadcasted_iota(jnp.int32, end.shape, 1)
    end = jnp.where(lane == LANES - 1, nxt_row_start, end)

    v = jnp.where(end > 0, s, zero)
    f = end.astype(jnp.int32)
    zero32 = jnp.zeros((), jnp.int32)
    k = 1
    while k < LANES:
        vr = _shift_lanes_left(v, k, zero)
        fr = _shift_lanes_left(f, k, zero32)
        v = jnp.where(f > 0, v, vr)
        f = f | fr
        k *= 2
    rv = v[:, :1]
    rf = f[:, :1]
    pv = _shift_rows_left(rv, 1, zero)
    pf = _shift_rows_left(rf, 1, zero32)
    k = 1
    while k < rows:
        vr = _shift_rows_left(pv, k, zero)
        fr = _shift_rows_left(pf, k, zero32)
        pv = jnp.where(pf > 0, pv, vr)
        pf = pf | fr
        k *= 2
    v = jnp.where(f > 0, v, pv)
    f = f | pf
    cv = carry_v[0]
    fill = jnp.where(f > 0, v, cv)
    carry_v[0] = jnp.where(f[0, 0] > 0, v[:1, :1][0, 0], cv)
    carry_start[0] = start[:1, :1].astype(jnp.int32)[0, 0]
    return fill


def _fill_total_kernel(s_ref, f_ref, o_ref, carry_v, carry_start):
    """Generic segment-total broadcast (suffix-first fill), 32-bit dtype."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_v[0] = jnp.zeros((), s_ref.dtype)
        carry_start[0] = jnp.int32(1)

    fill = _suffix_pairs(s_ref[:, :], f_ref[:, :].astype(jnp.int32),
                         carry_v, carry_start, jnp.zeros((), s_ref.dtype))
    o_ref[:, :] = fill


def segment_broadcast_total(S: jax.Array, start_flags: jax.Array
                            ) -> jax.Array:
    """Broadcast each segment's END value (e.g. its inclusive-scan total)
    to every position of the segment. [Ep] in, [Ep] out."""
    n = S.shape[0]
    rows = pl.cdiv(n, LANES)
    brows = min(_ROWS, rows)
    grid = pl.cdiv(rows, brows)
    np_ = grid * brows * LANES
    if np_ != n:
        S = jnp.pad(S, (0, np_ - n))
        start_flags = jnp.pad(start_flags.astype(jnp.int8),
                              (0, np_ - n), constant_values=1)
    s2 = S.reshape(-1, LANES)
    f2 = start_flags.astype(jnp.int8).reshape(-1, LANES)
    rev = pl.BlockSpec((brows, LANES), lambda i: (grid - 1 - i, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fill_total_kernel,
        grid=(grid,),
        in_specs=[rev, rev],
        out_specs=rev,
        out_shape=jax.ShapeDtypeStruct(s2.shape, S.dtype),
        scratch_shapes=[pltpu.SMEM((1,), S.dtype),
                        pltpu.SMEM((1,), jnp.int32)],
        interpret=_interp(),
    )(s2, f2)
    return out.reshape(-1)[:n]


def _fwd_fill_starts(x, start, carry_v):
    """Forward segmented fill: every position takes the value at its
    segment's START (start-flagged position at or before it). [R, 128]
    int32 blocks, flat element order; carry_v holds the fill value at the
    previous block's last position."""
    from essentials_tpu.ops.scan_kernels import _shift_lanes, _shift_rows
    rows = x.shape[0]
    zero = jnp.zeros((), jnp.int32)
    v = jnp.where(start > 0, x, zero)
    f = start
    k = 1
    while k < LANES:
        sv = _shift_lanes(v, k, zero)
        sf = _shift_lanes(f, k, zero)
        v = jnp.where(f > 0, v, sv)
        f = f | sf
        k *= 2
    rv = v[:, LANES - 1:LANES]
    rf = f[:, LANES - 1:LANES]
    pv = _shift_rows(rv, 1, zero)
    pf = _shift_rows(rf, 1, zero)
    k = 1
    while k < rows:
        sv = _shift_rows(pv, k, zero)
        sf = _shift_rows(pf, k, zero)
        pv = jnp.where(pf > 0, pv, sv)
        pf = pf | sf
        k *= 2
    v = jnp.where(f > 0, v, pv)
    f = f | pf
    fill = jnp.where(f > 0, v, carry_v[0])
    carry_v[0] = fill[rows - 1:rows, LANES - 1:LANES][0, 0]
    return fill


def _k1_fill_eq_kernel(it_ref, x_ref, f_ref, i0_ref, i1_ref, o_ref,
                       carry_v):
    """K1 with start-authoritative levels: forward segment fill (only
    segment-start positions of lev_exp are trusted), frontier compare,
    gather c, transpose, gather b."""
    from essentials_tpu.ops.cube_router import _g2

    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_v[0] = jnp.int32(UNREACHED)

    x3 = x_ref[0]                                         # [8, B, C]
    flat = x3.reshape(_MSLAB_ROWS, LANES)
    sflat = f_ref[...].astype(jnp.int32).reshape(_MSLAB_ROWS, LANES)
    fill = _fwd_fill_starts(flat, sflat, carry_v)
    y = (fill == it_ref[0, 0]).astype(jnp.int32)
    y = y.reshape(x3.shape)
    y = _g2(y, i0_ref[...])
    y = jnp.swapaxes(y, 1, 2)                             # [8, C, B]
    y = _g2(y, i1_ref[...])
    out = jnp.swapaxes(y, 0, 1)                           # [C, 8, B]
    o_ref[0] = out if out.dtype == o_ref.dtype else out.astype(o_ref.dtype)


def _suffix_segor(z, end, carry_v):
    """Suffix (right-to-left) segmented OR: s[p] = OR of z[p..segment end].
    ``end`` marks segment END positions; carry_v holds the suffix value at
    the first position of the block to the right."""
    rows = z.shape[0]
    zero = jnp.zeros((), jnp.int32)
    v = z
    f = end
    k = 1
    while k < LANES:
        vr = _shift_lanes_left(v, k, zero)
        fr = _shift_lanes_left(f, k, zero)
        v = v | jnp.where(f > 0, zero, vr)
        f = f | fr
        k *= 2
    rv = v[:, :1]                            # whole-row suffix aggregate
    rf = f[:, :1]
    pv = _shift_rows_left(rv, 1, zero)       # rows strictly below, excl.
    pf = _shift_rows_left(rf, 1, zero)
    k = 1
    while k < rows:
        vr = _shift_rows_left(pv, k, zero)
        fr = _shift_rows_left(pf, k, zero)
        pv = pv | jnp.where(pf > 0, zero, vr)
        pf = pf | fr
        k *= 2
    v = v | jnp.where(f > 0, zero, pv)
    f = f | pf
    v = v | jnp.where(f > 0, zero, carry_v[0])
    carry_v[0] = v[:1, :1][0, 0]
    return v


def _k3_suffixor_update_kernel(x_ref, i_ref, f_ref, lev_ref, it_ref,
                               olev_ref, oany_ref, carry_v, carry_start):
    """K3 with the whole level tail fused: final gather, suffix segmented
    OR (segment totals land at segment STARTS), level update at starts,
    any-newly flag. Runs on a DESCENDING grid."""
    from essentials_tpu.ops.cube_router import _g2

    @pl.when(pl.program_id(0) == 0)          # LAST physical block
    def _():
        carry_v[0] = jnp.int32(0)
        carry_start[0] = jnp.int32(1)        # global last position is an end
        oany_ref[...] = jnp.zeros_like(oany_ref)

    from essentials_tpu.ops.cube_router import _widen
    x = _widen(x_ref[0])                                  # [C, 8, B]
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
    s = _suffix_segor(z, end, carry_v)
    carry_start[0] = start[:1, :1][0, 0]

    lev = lev_ref[0].reshape(_MSLAB_ROWS, LANES)
    newly = (start > 0) & (s > 0) & (lev == UNREACHED)
    out = jnp.where(newly, it_ref[0, 0] + 1, lev)
    olev_ref[0] = out.reshape(x.shape)
    # newly fires at segment STARTS only -> this counts newly VERTICES
    oany_ref[...] = oany_ref[...] + jnp.sum(newly.astype(jnp.int32))


_MSLAB_ROWS = 8 * LANES                      # flat rows per 8-m-slice slab
UNREACHED_E = 127          # edge-axis sentinel in SWAR mode (levels <= 126)


def _k1_fill_eq_swar_kernel(it_ref, x_ref, fp_ref, i0_ref, i1_ref, o_ref,
                            carry_v):
    """K1 with the forward fill + frontier compare on byte-SWAR packed
    words (4 flat rows per int32): ~3x less VPU work than the int32 fill.
    lev values must be <= 127 (UNREACHED_E sentinel)."""
    from essentials_tpu.ops.cube_router import _g2
    from essentials_tpu.ops import swar

    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_v[0] = jnp.int32(UNREACHED_E * 0x01010101)

    x3 = x_ref[0]                                         # [8, B, C] int32
    lev_p = swar.pack4(x3.reshape(_MSLAB_ROWS, LANES))    # [256, 128]
    fill, nc = swar.fill_from_starts(lev_p, fp_ref[0], carry_v[0])
    carry_v[0] = nc[0, 0]
    itw = it_ref[0, 0] * jnp.int32(0x01010101)
    y = swar.unpack4(swar.eq_bytes(fill, itw))            # [1024, 128] 0/1
    y = y.reshape(x3.shape)
    y = _g2(y, i0_ref[...])
    y = jnp.swapaxes(y, 1, 2)                             # [8, C, B]
    y = _g2(y, i1_ref[...])
    out = jnp.swapaxes(y, 0, 1)                           # [C, 8, B]
    o_ref[0] = out if out.dtype == o_ref.dtype else out.astype(o_ref.dtype)


def _k3_suffixor_update_swar_kernel(x_ref, i_ref, fp_ref, lev_ref, it_ref,
                                    olev_ref, ocnt_ref, carry_v,
                                    carry_start):
    """K3 tail with the suffix segmented OR, level update, and newly count
    on byte-SWAR packed words. Runs on a DESCENDING grid."""
    from essentials_tpu.ops.cube_router import _g2
    from essentials_tpu.ops import swar

    @pl.when(pl.program_id(0) == 0)          # LAST physical block
    def _():
        carry_v[0] = jnp.int32(0)
        carry_start[0] = jnp.int32(1)        # global last position is an end
        ocnt_ref[...] = jnp.zeros_like(ocnt_ref)

    from essentials_tpu.ops.cube_router import _widen
    x = _widen(x_ref[0])                                  # [C, 8, B]
    x = jnp.swapaxes(x, 0, 1)                             # [8, C, B]
    x = jnp.swapaxes(x, 1, 2)                             # [8, B, C]
    x = _g2(x, i_ref[...])
    zp = swar.pack4(x.reshape(_MSLAB_ROWS, LANES))        # [256, 128]
    fp = fp_ref[0]
    end, ncs = swar.end_flags(fp, carry_start[0], zp.shape[0])
    s, ncv = swar.suffix_or(zp, end, carry_v[0])
    carry_v[0] = ncv[0, 0]
    carry_start[0] = ncs[0, 0]

    lev_p = swar.pack4(lev_ref[0].reshape(_MSLAB_ROWS, LANES))
    unreached = jnp.int32(UNREACHED_E * 0x01010101)
    newly = fp & s & swar.eq_bytes(lev_p, unreached)      # 0/1 bytes, starts
    nm = swar.byte_mask(newly)
    itw = (it_ref[0, 0] + 1) * jnp.int32(0x01010101)
    out_p = swar.bsel(nm, itw, lev_p)
    olev_ref[0] = swar.unpack4(out_p).reshape(x.shape)
    # bytes are 0/1: byte3 of newly * 0x01010101 is the per-word popcount
    percnt = jax.lax.shift_right_logical(newly * jnp.int32(0x01010101), 24)
    ocnt_ref[...] = ocnt_ref[...] + jnp.sum(percnt)


def pack_flags(flags: jax.Array, L: int) -> jax.Array:
    """Pack [n] 0/1 start flags into the per-slab plane-contiguous SWAR
    word layout: [L/512, 128] int32 (byte b of word (s*256+pr, l) = flag
    at slab s, flat row 256*b+pr... see ops/swar.py). Computed once per
    run; loop-invariant."""
    f = flags.astype(jnp.int32)
    if f.shape[0] != L:
        f = jnp.pad(f, (0, L - f.shape[0]), constant_values=1)
    g4 = f.reshape(-1, 4, 256, LANES)                     # per 1024-row slab
    return (g4[:, 0] | (g4[:, 1] << 8) | (g4[:, 2] << 16)
            | (g4[:, 3] << 24)).reshape(-1, LANES)


def fused_superstep2(g, lev_exp: jax.Array, it, *, swar: bool = False,
                     fp: jax.Array | None = None,
                     i8_carrier: bool = False) -> tuple:
    """One dense BFS level as THREE kernels (K1 fill+eq+route-head, K2
    middle, K3 route-tail + suffix segmented OR + level update).

    Start-authoritative contract: only segment-START positions of lev_exp
    are meaningful; K1 forward-fills them across each segment before the
    frontier compare, K3 writes updates at starts only. Returns
    (lev_exp', newly_vertex_count int32[1,1]).

    swar=True runs the fill / suffix-OR ladders on byte-SWAR packed words
    (ops/swar.py, ~3x less VPU): requires levels <= 126 (sentinel
    UNREACHED_E=127) and ``fp`` = pack_flags(g.csc_seg_flags, L) reshaped
    [G, 256, 128] (loop-invariant; compute once per run)."""
    from essentials_tpu.ops.cube_router import _plan_kparts, _MSLAB, LANES as CL
    from jax.experimental.pallas import tpu as _pltpu

    plan = g.route_fwd
    L = plan.length
    n = lev_exp.shape[0]

    def bs(shp, im):
        return pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)

    i0, i1, i6, k2_kernel, k2_idx = _plan_kparts(plan, bs)
    M = plan.wide if plan.form == "wbc" else plan.wide * CL
    G = M // _MSLAB
    unreached = UNREACHED_E if swar else UNREACHED
    # i8_carrier: the routed eq-output is 0/1 — an int8 inter-kernel
    # carrier saves 12 B/edge of the level's ~34 B (the gathers widen to
    # int32 inside VMEM; Mosaic lane gathers are int32-only)
    carrier_dt = jnp.int8 if i8_carrier else jnp.int32
    x = lev_exp if n == L else jnp.pad(lev_exp, (0, L - n),
                                       constant_values=unreached)
    xm = x.reshape(1, M, CL, CL)
    it_s = jnp.asarray(it, jnp.int32).reshape(1, 1)

    if swar:
        fpm = fp.reshape(G, 2 * CL, CL)
        k1_kernel = _k1_fill_eq_swar_kernel
        k3_kernel = _k3_suffixor_update_swar_kernel
        flag_spec = bs((1, 2 * CL, CL), lambda m, p: (m, 0, 0))
        flag_spec_rev = bs((1, 2 * CL, CL), lambda m, p: (G - 1 - m, 0, 0))
        flags_in = fpm
    else:
        flags = g.csc_seg_flags.astype(jnp.int8)
        flags = (flags if n == L else jnp.pad(flags, (0, L - n),
                                              constant_values=1))
        fm = flags.reshape(M, CL, CL)
        k1_kernel = _k1_fill_eq_kernel
        k3_kernel = _k3_suffixor_update_kernel
        flag_spec = bs((_MSLAB, CL, CL), lambda m, p: (m, 0, 0))
        flag_spec_rev = bs((_MSLAB, CL, CL), lambda m, p: (G - 1 - m, 0, 0))
        flags_in = fm

    k1 = pl.pallas_call(
        k1_kernel, grid=(G, 1),
        in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                  bs((1, _MSLAB, CL, CL), lambda m, p: (p, m, 0, 0)),
                  flag_spec,
                  bs((_MSLAB, CL, CL), lambda m, p: (m, 0, 0)),
                  bs((_MSLAB, CL, CL), lambda m, p: (m, 0, 0))],
        out_specs=bs((1, CL, _MSLAB, CL), lambda m, p: (p, 0, m, 0)),
        out_shape=jax.ShapeDtypeStruct((1, CL, M, CL), carrier_dt),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=_interp(),
    )(it_s, xm, flags_in, i0, i1)

    vmem = (_pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if plan.form == "tfbc" else None)
    k2 = pl.pallas_call(
        k2_kernel, grid=(CL, 1),
        in_specs=[bs((1, 1, M, CL), lambda c, p: (p, c, 0, 0))]
        + [spec for _, spec in k2_idx],
        out_specs=bs((1, 1, M, CL), lambda c, p: (p, c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, CL, M, CL), carrier_dt),
        compiler_params=vmem,
        interpret=_interp(),
    )(k1, *[a for a, _ in k2_idx])

    rev_in = bs((1, CL, _MSLAB, CL), lambda m, p: (p, 0, G - 1 - m, 0))
    rev_x = bs((1, _MSLAB, CL, CL), lambda m, p: (p, G - 1 - m, 0, 0))
    olev, oany = pl.pallas_call(
        k3_kernel, grid=(G, 1),
        in_specs=[rev_in,
                  bs((_MSLAB, CL, CL), lambda m, p: (G - 1 - m, 0, 0)),
                  flag_spec_rev, rev_x,
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=[rev_x,
                   pl.BlockSpec((1, 1), lambda m, p: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, M, CL, CL), jnp.int32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32)],
        interpret=_interp(),
    )(k2, i6, flags_in, xm, it_s)
    return olev.reshape(L)[:n], oany


def fused_route_or(g, lev_exp: jax.Array, it) -> jax.Array:
    """(lev_exp == it) -> CSR->CSC route -> segmented OR, as ONE 3-kernel
    pipeline (the compare fuses into K1, the scan into K3)."""
    from essentials_tpu.ops.cube_router import (_plan_kparts, _MSLAB,
                                                LANES as CL)
    from jax.experimental.pallas import tpu as _pltpu

    plan = g.route_fwd
    L = plan.length
    n = lev_exp.shape[0]

    def bs(shp, im):
        return pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)

    i0, i1, i6, k2_kernel, k2_idx = _plan_kparts(plan, bs)
    M = plan.wide if plan.form == "wbc" else plan.wide * CL
    x = lev_exp if n == L else jnp.pad(lev_exp, (0, L - n))
    xm = x.reshape(1, M, CL, CL)
    flags = g.csc_seg_flags.astype(jnp.int8)
    flags = (flags if n == L else jnp.pad(flags, (0, L - n)))
    fm = flags.reshape(M, CL, CL)

    k1 = pl.pallas_call(
        _k1_eq_kernel, grid=(M // _MSLAB, 1),
        in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                  bs((1, _MSLAB, CL, CL), lambda m, p: (p, m, 0, 0)),
                  bs((_MSLAB, CL, CL), lambda m, p: (m, 0, 0)),
                  bs((_MSLAB, CL, CL), lambda m, p: (m, 0, 0))],
        out_specs=bs((1, CL, _MSLAB, CL), lambda m, p: (p, 0, m, 0)),
        out_shape=jax.ShapeDtypeStruct((1, CL, M, CL), jnp.int32),
        interpret=_interp(),
    )(jnp.asarray(it, jnp.int32).reshape(1, 1), xm, i0, i1)

    vmem = (_pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
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

    k3 = pl.pallas_call(
        _k3_segor_kernel, grid=(M // _MSLAB, 1),
        in_specs=[bs((1, CL, _MSLAB, CL), lambda m, p: (p, 0, m, 0)),
                  bs((_MSLAB, CL, CL), lambda m, p: (m, 0, 0)),
                  bs((_MSLAB, CL, CL), lambda m, p: (m, 0, 0))],
        out_specs=bs((1, _MSLAB, CL, CL), lambda m, p: (p, m, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, M, CL, CL), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32)],
        interpret=_interp(),
    )(k2, i6, fm)
    return k3.reshape(L)[:n]


def fused_superstep(g, lev_exp: jax.Array, it, *,
                    unreached: int = UNREACHED) -> tuple:
    """One dense BFS level on the edge axis. Returns (lev_exp', cnt[1,1]).

    Fast path (TPU + cube plan): the 3-kernel start-authoritative pipeline
    (fused_superstep2 — fill+eq+route-head / middle / route-tail+suffix OR
    +level update). Fallback (CPU / non-cube plans): separate ops, writing
    full segments (a strict superset of the start-authoritative contract,
    so the two paths interoperate)."""
    from essentials_tpu.ops import cube_router
    if isinstance(g.route_fwd, cube_router.CubePlan) and \
            jax.default_backend() == "tpu" and not _INTERPRET:
        return fused_superstep2(g, lev_exp, it)
    from essentials_tpu.ops.permute import apply_plan
    from essentials_tpu.ops.scan_kernels import segmented_scan
    # fill from starts first: lev_exp may be start-authoritative-only
    lev_full = segmented_scan(lev_exp, g.csc_seg_flags, "first")
    y = (lev_full == it).astype(jnp.int32)
    z = apply_plan(y, g.route_fwd, n_valid=g.n_edges_padded)
    # pure-XLA segment totals (no Pallas on non-TPU backends)
    flags = g.csc_seg_flags
    n = z.shape[0]
    sid = jnp.cumsum(flags.astype(jnp.int32)) - flags[0].astype(jnp.int32)
    tot = jax.ops.segment_max(z, sid, num_segments=n)
    fill = tot[sid]
    newly = (fill > 0) & (lev_full == unreached)
    lev2 = jnp.where(newly, jnp.asarray(it + 1, jnp.int32), lev_full)
    cnt = jnp.sum((newly & (flags != 0)).astype(jnp.int32)).reshape(1, 1)
    return lev2, cnt


def init_lev_exp(g, source, unreached: int = UNREACHED) -> jax.Array:
    """lev_exp[p] = 0 where segment(p) == source else ``unreached``.

    The source's segment is the contiguous CSR range
    [row_offsets[source], row_offsets[source+1]) — one iota compare
    (~0.05 ms) instead of a full vertex->edge expansion route (~0.6 ms)."""
    o0 = g.row_offsets[source]
    o1 = g.row_offsets[jnp.asarray(source) + 1]
    p = jnp.arange(g.n_edges_padded, dtype=g.row_offsets.dtype)
    return jnp.where((p >= o0) & (p < o1), jnp.int32(0),
                     jnp.int32(unreached))


def collapse_lev_exp(g, lev_exp: jax.Array, source,
                     unreached: int = UNREACHED) -> jax.Array:
    """lev_exp -> per-vertex distances [Vp], translating the edge-axis
    sentinel (``unreached``; 127 in SWAR mode) to the vertex-axis
    UNREACHED (int32 max). Empty segments are UNREACHED except the
    source itself."""
    from essentials_tpu.ops.permute import apply_plan
    from essentials_tpu.ops.scan_kernels import segmented_scan
    route = g.off_route_csr
    n_seg = route.n_seg
    picked = apply_plan(lev_exp, route.inv_plan, n_valid=n_seg + 1)
    ff = segmented_scan(picked, route.run_start, "first")
    seg_len = route.seg_len
    lev_v = jnp.where((seg_len > 0) & (ff[:n_seg] < unreached),
                      ff[:n_seg], UNREACHED)
    lev_v = lev_v[:g.n_vertices_padded].at[source].min(0)
    return lev_v
