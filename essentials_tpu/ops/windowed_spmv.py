"""Windowed SpMV: y = A @ x in THREE kernels (design: docs/
windowed_spmv_design.md; feasibility probes: benchmarks/
probe_windowed_spmv.py, both bit-exact on chip).

The 7-kernel chain (ops/fused_spmv.py) spends 4 of its kernels moving
vertex-sized information across full-length routes (expand x over the
CSC offsets, pick boundaries over the CSR offsets). This module replaces
both with per-slab machinery:

  K1w  window-slice the VMEM-resident compacted-x diff table at a static
       8-row-aligned offset, place diffs at segment starts with a
       PER-SLAB static Benes permutation, telescoping int32 cumsum
       (SMEM carry), multiply by the CSC-ordered weights, and start the
       CSC->CSR route (gather c / transpose / gather b)
  K2   the route's middle kernel, unchanged
  K3w  finish the route, segmented f32 sum over the CSR flags, move each
       segment-END sum to a compact output prefix with a per-slab
       INVERSE placement permutation, write at an aligned compact offset
       (ascending overlapping windows)

plus cheap vertex-axis pre/post compaction routes. ~40 B/edge vs the
chain's ~77.

Reference parity: gunrock::spmv via mgpu transform_segreduce
(/root/reference/include/gunrock/algorithms/spmv.hxx:106-126).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

LANES = 128
SLAB = 8 * LANES * LANES          # 131072 positions per slab
SLAB_ROWS = SLAB // LANES         # 1024
INF_BITS = np.float32(np.inf).view(np.int32).item()   # 0x7f800000


@partial(jax.tree_util.register_dataclass,
         data_fields=["xc_perm", "xc_route", "y_route",
                      "row0", "win_lo",
                      "win_hi", "p_stages", "q_stages",
                      "y_src_rank", "y_mask", "w_csc_l", "flags_l"],
         meta_fields=["G", "L", "n_cseg", "n_rseg", "vp", "q_spans",
                      "dxc_pad_rows"])
@dataclass(frozen=True)
class WindowedSpmvPlan:
    """Per-graph static structure for the 3-kernel SpMV."""
    G: int                    # slabs (= route M // 8)
    L: int                    # route length (padded edge axis)
    n_cseg: int               # nonempty CSC segments (compacted x len)
    n_rseg: int               # nonempty CSR segments (compact y len)
    vp: int                   # padded vertex count
    q_spans: tuple            # per-slab (cb8_row, offset, len): REAL
                              # compact span + aligned out base (host)
    xc_perm: jax.Array        # int32[vp]: xc[i] = x[xc_perm[i]] (gather)
    xc_route: object          # PermutePlan: x -> compact prefix (device)
    y_route: object           # PermutePlan: compact y -> vertex slots
    dxc_pad_rows: int         # rows of the resident dxc table
    row0: jax.Array           # int32[G] aligned window row offsets
    win_lo: jax.Array         # int32[G] used window slot range [lo, hi]
    win_hi: jax.Array         # (slots outside hold OTHER slabs' diffs —
                              #  masked to 0 before the placement perm so
                              #  filler positions read zeros)
    p_stages: tuple           # 5 stacked [G, ...] placement stages
    q_stages: tuple           # 5 stacked [G, ...] compact stages
    y_src_rank: jax.Array     # int32[vp]: compact slot per vertex (CSR)
    y_mask: jax.Array         # bool[vp]: vertex has a nonempty CSR seg
    w_csc_l: jax.Array        # f32[L] weights in CSC order (pad -> 0)
    flags_l: jax.Array        # int8[L] CSR segment-start flags (pad -> 1)


def _slab_perm(src_of_pos: np.ndarray) -> np.ndarray:
    """Complete a partial gather map over [SLAB] into a permutation:
    positions with src >= 0 keep their source; the rest take the unused
    sources in ascending order."""
    used = np.zeros(SLAB, bool)
    sel = src_of_pos >= 0
    used[src_of_pos[sel]] = True
    free = np.nonzero(~used)[0]
    out = src_of_pos.copy()
    out[~sel] = free
    return out


def build_windowed_plan(g) -> WindowedSpmvPlan | None:
    """Host symbolic phase. None when unsupported: no cube route, dxc
    table too big for VMEM residency, or a slab's rank span exceeds the
    window (near-all-degree-1 regions) — callers fall back to the
    chain variant."""
    from essentials_tpu.ops.cube_router import CubePlan, build_cube_plan

    if not isinstance(g.route_bwd, CubePlan) or g.csc_values is None:
        return None
    L = g.route_bwd.length
    if L % SLAB != 0:
        return None
    G = L // SLAB
    vp = g.n_vertices_padded
    ep = g.n_edges_padded

    csc_off = np.asarray(g.csc_offsets, np.int64)
    csr_off = np.asarray(g.row_offsets, np.int64)

    # ---- CSC side: ranks of nonempty segments, per-position rank ----
    clen = np.diff(csc_off)
    nonempty_c = np.nonzero(clen > 0)[0]
    n_cseg = int(nonempty_c.shape[0])
    if (n_cseg + 1) * 4 > 12 * 1024 * 1024:
        # dxc residency gate: the resident table must fit VMEM alongside
        # the pipeline's block buffers (kernels run with a 100 MB scoped
        # limit; 12 MB measured fine at rmat21's ~2M-segment table)
        return None
    # rank at each segment START position (only starts get placements)
    start_pos = csc_off[nonempty_c]                      # ascending
    ranks = np.arange(n_cseg, dtype=np.int64)

    # per-slab window base + placement perms
    row0 = np.zeros(G, np.int64)
    win_lo = np.zeros(G, np.int64)
    win_hi = np.full(G, -1, np.int64)
    p_perms = np.empty((G, SLAB), np.int64)
    # rank of the segment COVERING each slab start (for carry continuity
    # nothing needed on host — the int32 carry handles it)
    lo_idx = np.searchsorted(start_pos, np.arange(G, dtype=np.int64) * SLAB)
    hi_idx = np.searchsorted(start_pos,
                             (np.arange(G, dtype=np.int64) + 1) * SLAB)
    for s in range(G):
        a, b = int(lo_idx[s]), int(hi_idx[s])
        src = np.full(SLAB, -1, np.int64)
        if b > a:
            r_first, r_last = int(ranks[a]), int(ranks[b - 1])
            # largest 1024-aligned (8-row) base still covering r_first:
            # maximizes headroom for r_last; if even this spills, no
            # aligned window can cover the slab's rank span
            base = r_first // 1024 * 1024
            if r_last - base >= SLAB:
                return None                  # spill: fall back
            row0[s] = base // LANES
            win_lo[s] = r_first - base
            win_hi[s] = r_last - base
            src[start_pos[a:b] - s * SLAB] = ranks[a:b] - base
        else:
            row0[s] = 0
        p_perms[s] = _slab_perm(src)

    # ---- CSR side: segment ends -> compact prefix ----
    rlen = np.diff(csr_off)
    nonempty_r = np.nonzero(rlen > 0)[0]
    n_rseg = int(nonempty_r.shape[0])
    end_pos = csr_off[nonempty_r + 1] - 1                # ascending
    r_ranks = np.arange(n_rseg, dtype=np.int64)
    cb8 = np.zeros(G, np.int64)
    q_perms = np.empty((G, SLAB), np.int64)
    q_spans = []
    elo = np.searchsorted(end_pos, np.arange(G, dtype=np.int64) * SLAB)
    ehi = np.searchsorted(end_pos,
                          (np.arange(G, dtype=np.int64) + 1) * SLAB)
    for s in range(G):
        a, b = int(elo[s]), int(ehi[s])
        src = np.full(SLAB, -1, np.int64)
        if b > a:
            r_first, r_last = int(r_ranks[a]), int(r_ranks[b - 1])
            base = r_first // 1024 * 1024
            if r_last - base >= SLAB:
                return None                  # spill: fall back
            cb8[s] = base // LANES
            # compact slot (rank - base) takes the slab END position
            src[r_ranks[a:b] - base] = end_pos[a:b] - s * SLAB
            q_spans.append((int(base // LANES), r_first - base,
                            r_last - r_first + 1))
        else:
            cb8[s] = 0
            q_spans.append((0, 0, 0))
        q_perms[s] = _slab_perm(src)

    # stack per-slab cube plans. Stage layouts are REARRANGED so the
    # minor axis is always 128 lanes: the natural wbc algebra puts the
    # 8-wide middle axis minor ([C,B,W]), which Mosaic pads 16x; instead
    # the kernels keep [W,C,B] and run the w-stage as a LEADING-axis
    # 8-way select (the tfbc T-stage trick):
    #   s2p [W,C,B] = s2.transpose(2,0,1);  s3p [W,C,B] = s3.transpose(1,0,2)
    def stack_plans(perms):
        plans = [build_cube_plan(p) for p in perms]
        outs = []
        for i in range(5):
            arrs = [np.asarray(pl.stages[i]) for pl in plans]
            if i == 2:
                arrs = [a.transpose(2, 0, 1).astype(np.int8) for a in arrs]
            elif i == 3:
                arrs = [a.transpose(1, 0, 2) for a in arrs]
            outs.append(jnp.asarray(np.stack(arrs)))
        return tuple(outs)

    p_stages = stack_plans(p_perms)
    q_stages = stack_plans(q_perms)

    # vertex-axis compaction maps: reference algebra uses the gather
    # arrays; the device path uses small V-axis routes (arbitrary
    # V-gathers serialize at ~7.5 ns/elem on TPU)
    from essentials_tpu.ops.permute import route_permutation
    xc_perm = np.zeros(vp, np.int64)
    xc_perm[:n_cseg] = nonempty_c
    xg = np.full(vp, -1, np.int64)
    xg[:n_cseg] = nonempty_c
    used = np.zeros(vp, bool)
    used[nonempty_c] = True
    xg[n_cseg:] = np.nonzero(~used)[0]
    xc_route = route_permutation(xg)
    y_src_rank = np.zeros(vp, np.int64)
    y_src_rank[nonempty_r] = r_ranks
    y_mask = np.zeros(vp, bool)
    y_mask[nonempty_r] = True
    yg = np.full(vp, -1, np.int64)
    yg[nonempty_r] = r_ranks
    usedr = np.zeros(vp, bool)
    usedr[:n_rseg] = True
    yg[yg < 0] = np.nonzero(~usedr)[0][:int((yg < 0).sum())]
    y_route = route_permutation(yg)

    dxc_pad_rows = SLAB_ROWS * ((n_cseg + SLAB - 1) // SLAB + 1)

    w = np.asarray(g.csc_values, np.float32).copy()
    w[g.n_edges:] = 0.0
    w_l = np.zeros(L, np.float32)
    w_l[:ep] = w
    flags_l = np.ones(L, np.int8)
    flags_l[:ep] = np.asarray(g.csr_seg_flags).astype(np.int8)

    return WindowedSpmvPlan(
        G=G, L=L, n_cseg=n_cseg, n_rseg=n_rseg, vp=vp,
        q_spans=tuple(q_spans),
        xc_perm=jnp.asarray(xc_perm.astype(np.int32)),
        xc_route=xc_route, y_route=y_route,
        dxc_pad_rows=dxc_pad_rows,
        row0=jnp.asarray(row0.astype(np.int32)),
        win_lo=jnp.asarray(win_lo.astype(np.int32)),
        win_hi=jnp.asarray(win_hi.astype(np.int32)),
        p_stages=p_stages, q_stages=q_stages,
        y_src_rank=jnp.asarray(y_src_rank.astype(np.int32)),
        y_mask=jnp.asarray(y_mask),
        w_csc_l=jnp.asarray(w_l), flags_l=jnp.asarray(flags_l))


# ------------------------------------------------------------------ #
# reference algebra (CPU tests mirror the kernel stages exactly)

def _apply_slab_perm_ref(win_flat, stages, s):
    from essentials_tpu.ops.cube_router import CubePlan, _ref_apply
    st = [np.asarray(x[s]) for x in stages]
    st[2] = st[2].transpose(1, 2, 0).astype(np.int16)   # [W,C,B]->[C,B,W]
    st[3] = st[3].transpose(1, 0, 2)                    # [W,C,B]->[C,W,B]
    plan = CubePlan(stages=tuple(st), form="wbc", length=SLAB, wide=8)
    return _ref_apply(win_flat, plan)


def windowed_pipeline_ref(g, plan: WindowedSpmvPlan, xc: jax.Array,
                          message: str = "mul", reduce: str = "sum",
                          w_l=None) -> jax.Array:
    """Stage-exact jnp replay of the 3-kernel pipeline from a COMPACT
    input (CSC rank space). Returns the merged compact int32 bits [n_rseg
    + SLAB] (ident at unwritten positions)."""
    from essentials_tpu.ops.cube_router import _ref_apply
    from essentials_tpu.ops.scan_kernels import segmented_scan

    G = plan.G
    bits = jax.lax.bitcast_convert_type(xc.astype(jnp.float32), jnp.int32)
    dxc = jnp.diff(bits, prepend=jnp.zeros(1, jnp.int32))
    dxc = jnp.where(jnp.arange(dxc.shape[0]) <= plan.n_cseg, dxc, 0)
    need = plan.dxc_pad_rows * LANES
    dxc = dxc[:need] if dxc.shape[0] >= need \
        else jnp.pad(dxc, (0, need - dxc.shape[0]))

    # K1w algebra: window + placement + global cumsum + message
    placed = []
    iota = jnp.arange(SLAB, dtype=jnp.int32)
    for s in range(G):
        win = jax.lax.dynamic_slice(dxc, (plan.row0[s] * LANES,), (SLAB,))
        win = jnp.where((iota >= plan.win_lo[s]) & (iota <= plan.win_hi[s]),
                        win, 0)
        placed.append(_apply_slab_perm_ref(win, plan.p_stages, s))
    placed = jnp.concatenate(placed)
    x_exp = jax.lax.bitcast_convert_type(jnp.cumsum(placed), jnp.float32)
    if message == "mul":
        w = plan.w_csc_l if w_l is None else w_l
        prod = x_exp * w
    elif message == "add":
        w = plan.w_csc_l if w_l is None else w_l
        prod = x_exp + w
    else:
        prod = x_exp
    routed = jax.lax.bitcast_convert_type(
        _ref_apply(jax.lax.bitcast_convert_type(prod, jnp.int32),
                   g.route_bwd), jnp.float32)

    # K3w algebra: segmented reduce + per-slab compact writes. The ref
    # writes each slab's EXACT real compact span (host-static slices), so
    # no window garbage exists here; the kernel path instead writes full
    # overlapping windows and needs the static repair route (see the
    # design doc's "overlap damage" section).
    if reduce == "min":
        rb = jax.lax.bitcast_convert_type(routed, jnp.int32)
        sums = segmented_scan(rb, plan.flags_l != 0, "min")
        ident = jnp.int32(INF_BITS)
    else:
        sums = jax.lax.bitcast_convert_type(
            segmented_scan(routed, plan.flags_l != 0, "add"), jnp.int32)
        ident = jnp.int32(0)
    yc = jnp.full(plan.n_rseg + SLAB, ident, jnp.int32)
    for s in range(G):
        cb, lo, ln = plan.q_spans[s]
        if ln == 0:
            continue
        slab = sums[s * SLAB:(s + 1) * SLAB]
        comp = _apply_slab_perm_ref(slab, plan.q_stages, s)
        yc = jax.lax.dynamic_update_slice(
            yc, jax.lax.slice(comp, [lo], [lo + ln]),
            (cb * LANES + lo,))
    return yc


def spmv_windowed_ref(g, plan: WindowedSpmvPlan, x: jax.Array,
                      unit: bool = False) -> jax.Array:
    """Stage-exact jnp replay of the windowed pipeline (no Pallas)."""
    x = x.astype(jnp.float32)
    if x.shape[0] < plan.vp:
        x = jnp.pad(x, (0, plan.vp - x.shape[0]))
    xc = x[plan.xc_perm]                                 # compact (CSC)
    yc = windowed_pipeline_ref(g, plan, xc,
                               message="none" if unit else "mul",
                               reduce="sum")
    ycf = jax.lax.bitcast_convert_type(yc, jnp.float32)
    y = jnp.where(plan.y_mask, ycf[plan.y_src_rank], 0.0)
    return y[:plan.vp]



# ------------------------------------------------------------------ #
# Pallas kernels (TPU path)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _k1w_kernel(message, row0_ref, lo_ref, hi_ref, dxc_ref, s0, s1, s2,
                s3, s4, *rest):
    """Window + mask + per-slab placement perm + telescoping cumsum +
    message + route head, one slab per grid step (grid (G, 1)).
    ``message`` (static): 'mul' (x[dst]*w — SpMV/PR), 'add' (x[dst]+w on
    f32 bit patterns — SSSP relax), 'none' (x[dst] only; unweighted
    HITS/BC sums — saves the [L] weight read entirely)."""
    from essentials_tpu.ops.cube_router import _g2, _block_cumsum
    if message == "none":
        i0b_ref, i1b_ref, o_ref, carry = rest
        w_ref = None
    else:
        w_ref, i0b_ref, i1b_ref, o_ref, carry = rest
    g = pl.program_id(0)

    r0 = pl.multiple_of(row0_ref[g], 8)
    win = dxc_ref[pl.ds(r0, SLAB_ROWS), :]                # [1024, 128]
    row_i = jax.lax.broadcasted_iota(jnp.int32, win.shape, 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, win.shape, 1)
    idx = row_i * LANES + lane_i
    win = jnp.where((idx >= lo_ref[g]) & (idx <= hi_ref[g]), win, 0)

    a = win.reshape(8, LANES, LANES)                      # [W, B, C]
    a = _g2(a, s0[0])
    a = jnp.swapaxes(a, 1, 2)                             # [W, C, B]
    a = _g2(a, s1[0])
    iw = s2[0].astype(jnp.int32)                          # [W', C, B]
    acc = jnp.zeros_like(a)
    for t in range(8):                                    # leading select
        acc = jnp.where(iw == t, a[t][None], acc)
    a = _g2(acc, s3[0])                                   # [W, C, B]
    a = jnp.swapaxes(a, 1, 2)                             # [W, B, C]
    placed = _g2(a, s4[0])

    x = _block_cumsum(placed, carry, False, False)        # telescoping
    if message != "none":
        xf = jax.lax.bitcast_convert_type(x, jnp.float32)
        xf = xf * w_ref[0] if message == "mul" else xf + w_ref[0]
        x = jax.lax.bitcast_convert_type(xf, jnp.int32)
    x = _g2(x, i0b_ref[...])                              # route head
    x = jnp.swapaxes(x, 1, 2)
    x = _g2(x, i1b_ref[...])
    o_ref[0] = jnp.swapaxes(x, 0, 1)                      # [C, 8, B]


def _k3w_kernel(reduce, x_ref, i6b_ref, f_ref, q0, q1, q2, q3, q4, o_ref,
                carry_v, carry_f):
    """Route tail + segmented reduce + per-slab compact perm into a
    PRIVATE [G, SLAB] output (non-overlapping; host-static spans are
    merged afterwards). Grid (G, 1) ascending. ``reduce`` (static):
    'sum' (f32 via bitcast) or 'min' (int32 bit order — exact for
    non-negative f32 bit patterns, the fused_sssp trick)."""
    from essentials_tpu.ops.cube_router import _g2
    from essentials_tpu.ops.scan_kernels import _block_scan

    minmode = reduce == "min"
    ident = (jnp.int32(INF_BITS) if minmode else jnp.float32(0))
    op = jnp.minimum if minmode else jnp.add

    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_v[0] = ident
        carry_f[0] = jnp.int32(0)

    x = x_ref[0]                                          # [C, 8, B]
    x = jnp.swapaxes(x, 0, 1)
    x = jnp.swapaxes(x, 1, 2)                             # [8, B, C]
    x = _g2(x, i6b_ref[...])
    v = x.reshape(SLAB_ROWS, LANES)
    if not minmode:
        v = jax.lax.bitcast_convert_type(v, jnp.float32)
    f = f_ref[0].reshape(SLAB_ROWS, LANES).astype(jnp.int32)
    sv, sf, (bv, bf) = _block_scan(v, f, op, ident, True)
    cv, cf = carry_v[0], carry_f[0]
    sums = jnp.where(sf > 0, sv, op(sv, cv))
    carry_v[0] = jnp.where(bf > 0, bv, op(cv, bv))
    carry_f[0] = bf | cf

    if not minmode:
        sums = jax.lax.bitcast_convert_type(sums, jnp.int32)
    a = sums.reshape(8, LANES, LANES)
    a = _g2(a, q0[0])
    a = jnp.swapaxes(a, 1, 2)                             # [W, C, B]
    a = _g2(a, q1[0])
    iw = q2[0].astype(jnp.int32)                          # [W', C, B]
    acc = jnp.zeros_like(a)
    for t in range(8):
        acc = jnp.where(iw == t, a[t][None], acc)
    a = _g2(acc, q3[0])
    a = jnp.swapaxes(a, 1, 2)                             # [W, B, C]
    o_ref[0] = _g2(a, q4[0])                              # [8, B, C]


def compact_bits(plan: WindowedSpmvPlan, xc: jax.Array) -> jax.Array:
    """Compact x (CSC rank space, any length >= n_cseg) -> the padded
    dxc diff table [dxc_pad_rows, LANES] the K1w kernel windows over."""
    bits = jax.lax.bitcast_convert_type(xc.astype(jnp.float32), jnp.int32)
    dxc = jnp.diff(bits, prepend=jnp.zeros(1, jnp.int32))
    dxc = jnp.where(jnp.arange(dxc.shape[0]) <= plan.n_cseg, dxc, 0)
    need = plan.dxc_pad_rows * LANES        # table sized by n_cseg, not vp
    dxc = dxc[:need] if dxc.shape[0] >= need \
        else jnp.pad(dxc, (0, need - dxc.shape[0]))
    return dxc.reshape(-1, LANES)


def windowed_pipeline(g, plan: WindowedSpmvPlan, dxc2: jax.Array,
                      message: str = "mul", reduce: str = "sum",
                      w_l: jax.Array | None = None) -> jax.Array:
    """The 3-kernel edge-axis pipeline: expand (windows + placement +
    telescoping cumsum) -> message -> route CSC->CSR -> segmented reduce
    -> per-slab compact perm. Returns the private [G, SLAB] int32 slabs
    (merge with merge_compact). message: 'mul'|'add'|'none'; reduce:
    'sum'|'min'; w_l overrides plan.w_csc_l ([L] f32, CSC order)."""
    from essentials_tpu.ops.cube_router import _plan_kparts, _MSLAB

    L, G = plan.L, plan.G

    def bs(shp, im):
        return pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)

    i0b, i1b, i6b, k2_kernel, k2_idx = _plan_kparts(g.route_bwd, bs)
    fm = plan.flags_l.reshape(G, 8, LANES, LANES)

    def gmap(shape_nd):
        return lambda gi, p, *_: (gi,) + (0,) * (shape_nd - 1)

    p_specs = [bs((1,) + tuple(st.shape[1:]), gmap(st.ndim))
               for st in plan.p_stages]
    vmem = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    if message == "none":
        w_specs, w_args = [], []
    else:
        w = plan.w_csc_l if w_l is None else w_l
        w_specs = [bs((1, 8, LANES, LANES),
                      lambda gi, p, *_: (gi, 0, 0, 0))]
        w_args = [w.reshape(G, 8, LANES, LANES)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G, 1),
        in_specs=[bs((dxc2.shape[0], LANES), lambda gi, p, *_: (0, 0))]
        + p_specs + w_specs
        + [bs((_MSLAB, LANES, LANES), lambda gi, p, *_: (gi, 0, 0)),
           bs((_MSLAB, LANES, LANES), lambda gi, p, *_: (gi, 0, 0))],
        out_specs=bs((1, LANES, _MSLAB, LANES),
                     lambda gi, p, *_: (p, 0, gi, 0)),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )
    k1 = pl.pallas_call(
        partial(_k1w_kernel, message), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, LANES, G * _MSLAB, LANES),
                                       jnp.int32),
        compiler_params=vmem,
    )(plan.row0, plan.win_lo, plan.win_hi, dxc2, *plan.p_stages, *w_args,
      i0b, i1b)

    M = G * _MSLAB
    k2 = pl.pallas_call(
        k2_kernel, grid=(LANES, 1),
        in_specs=[bs((1, 1, M, LANES), lambda c, p: (p, c, 0, 0))]
        + [spec for _, spec in k2_idx],
        out_specs=bs((1, 1, M, LANES), lambda c, p: (p, c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, LANES, M, LANES), jnp.int32),
        compiler_params=vmem,
    )(k1, *[a for a, _ in k2_idx])

    priv = pl.pallas_call(
        partial(_k3w_kernel, reduce), grid=(G, 1),
        in_specs=[bs((1, LANES, _MSLAB, LANES),
                     lambda gi, p: (p, 0, gi, 0)),
                  bs((_MSLAB, LANES, LANES), lambda gi, p: (gi, 0, 0)),
                  bs((1, 8, LANES, LANES), lambda gi, p: (gi, 0, 0, 0))]
        + [bs((1,) + tuple(st.shape[1:]),
              lambda gi, p, nd=st.ndim: (gi,) + (0,) * (nd - 1))
           for st in plan.q_stages],
        out_specs=bs((1, 8, LANES, LANES), lambda gi, p: (gi, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, 8, LANES, LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32 if reduce == "min"
                                   else jnp.float32),
                        pltpu.SMEM((1,), jnp.int32)],
        compiler_params=vmem,
    )(k2, i6b, fm, *plan.q_stages)
    return priv.reshape(G, SLAB)


def merge_compact(plan: WindowedSpmvPlan, priv: jax.Array,
                  ident_bits: int = 0) -> jax.Array:
    """Merge the private per-slab compact spans into one [vp] int32
    compact vector (spans are contiguous, disjoint rank ranges);
    positions with no span keep ``ident_bits``."""
    yc = jnp.full(plan.vp, ident_bits, jnp.int32)
    for s in range(plan.G):
        cb, lo, ln = plan.q_spans[s]
        if ln == 0:
            continue
        yc = jax.lax.dynamic_update_slice(
            yc, jax.lax.slice(priv[s], [lo], [lo + ln]),
            (cb * LANES + lo,))
    return yc


def spmv_windowed(g, plan: WindowedSpmvPlan, x: jax.Array,
                  unit: bool = False) -> jax.Array:
    """TPU path: 3 Pallas kernels + V-axis compaction routes. unit=True
    computes the UNWEIGHTED sum y[s] = sum x[dst] (HITS/BC — skips the
    weight read)."""
    from essentials_tpu.ops.permute import apply_plan

    x = x.astype(jnp.float32)
    if x.shape[0] < plan.vp:
        x = jnp.pad(x, (0, plan.vp - x.shape[0]))
    xc = apply_plan(x, plan.xc_route)                     # compact prefix
    dxc2 = compact_bits(plan, xc)
    priv = windowed_pipeline(g, plan, dxc2,
                             message="none" if unit else "mul",
                             reduce="sum")
    yc = jax.lax.bitcast_convert_type(merge_compact(plan, priv),
                                      jnp.float32)
    y = apply_plan(yc, plan.y_route)
    return jnp.where(plan.y_mask, y, 0.0)
