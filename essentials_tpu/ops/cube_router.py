"""Cube router v2: fused Beneš permutation kernels at HBM bandwidth.

The legacy executor (ops/permute.py:_apply) runs the Beneš recursion as 5-7
flat row-gather kernels with 4-6 *global HBM transposes* between them —
measured 7.7 ms for an 8.4M-element route on v5e, ~80x off roofline. This
module executes the SAME plan as THREE fused Pallas kernels over a
radix-128 "cube" view of the array, with all transposes done on 128x128
tiles inside VMEM:

  N <= 16384           [B, C]          3 stages  (c, b, c)      1 kernel
  N <= 8,388,608       [W, B, C]       5 stages  (c, b, w, b, c)
  N <= ~100M           [T, F, B, C]    7 stages  (c, b, f, t, f, b, c)

where C = B = F = 128 lanes, W = N/16384 <= 512 ("wide" middle executed as
chunked lane gathers + selects), T = N/2097152 <= 48 (VMEM bound).

Kernel grouping (one HBM round-trip each):
  K1 = first two stages   (per (outer)-slice: gather c, tile-transpose,
                           gather b)                 in [.., B, C] -> [.., C, B]
  K2 = all middle stages  (per c-slice: every gather permutes only the
                           row index (w / t,f), VMEM-local relayouts)
  K3 = last stage         (per (outer)-slice: tile-transpose, gather c)

Payloads ride as a leading batch axis; int8 payloads stay int8 in HBM and
are widened to int32 only inside VMEM (Mosaic v5e gathers are int32-only).

Plan indices are int8 (every stage gathers within <=128 lanes) except the
wide-middle stage (int16, values < 512).

Reference parity: this is the TPU replacement for the reference's
load-balanced scatter/gather kernels (advance/block_mapped.hxx:38-147,
merge_path.hxx:89-113) — data movement between CSR and CSC edge orders.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

LANES = 128
_SEG = LANES * LANES          # 16384
_CUBE = _SEG * LANES          # 2097152
MAX_WIDE = 512                # wide-middle width cap ([W,B,C] form)
MAX_T = 40                    # VMEM cap for the [T,F,B,C] middle kernel


def cube_routable_length(n: int) -> int | None:
    """Padded length the cube executor supports, or None if out of range.

    W is kept a multiple of 8 so the K1/K3 kernels can block 8 w-slices
    without partial-block masking."""
    def up(x, m):
        return -(-x // m) * m
    if n <= _SEG:
        return None                      # small: legacy path is fine
    if n <= _SEG * MAX_WIDE:
        return up(n, 8 * _SEG)
    if n <= _CUBE * MAX_T:
        # T a multiple of 8: the K2 middle kernel transposes [F, B, T]
        # blocks, and a non-sublane-aligned T minor dim costs masked
        # relayouts on every stage (measured 142 vs 313 GB/s-model at T=15)
        return up(n, 8 * _CUBE)
    return None


@partial(jax.tree_util.register_dataclass,
         data_fields=["stages"], meta_fields=["form", "length", "wide"])
@dataclass(frozen=True)
class CubePlan:
    """Kernel-arranged Beneš stage indices.

    form "wbc": stages (c, b, w, b, c) with layouts
        [W,B,C] [W,C,B] [C,B,W] [C,W,B] [W,B,C]
    form "tfbc": stages (c, b, f, t, f, b, c) with layouts
        [T,F,B,C] [T,F,C,B] [C,T,B,F] [C,T',B,F] [C,T,B,F] [C,T,F,B] [T,F,B,C]
    (the t stage is a select-accumulate over the T axis, indices keyed by
    output slot t')
    """
    stages: tuple            # tuple of index arrays (int8 / int16)
    form: str                # "wbc" | "tfbc"
    length: int              # padded N
    wide: int                # W (wbc) or T (tfbc)


# ------------------------------------------------------------------ #
# plan construction (host, NumPy)

def _route_tree(perm: np.ndarray, max_leaf: int) -> dict:
    """_route_np clone with a configurable leaf width (wide leaves)."""
    from essentials_tpu.ops.permute import edge_color
    B, N = perm.shape
    if N <= max_leaf:
        return {"leaf": perm.astype(np.int32)}
    R, C = N // LANES, LANES
    p = np.arange(N)
    r_src = (perm // C).astype(np.int32)
    c_src = (perm % C).astype(np.int32)
    r_dst = np.broadcast_to((p // C).astype(np.int32), (B, N))
    off = (np.arange(B, dtype=np.int64) * R)[:, None]
    colors = edge_color((r_src + off).reshape(-1),
                        (r_dst + off).reshape(-1), B * R, C)
    m = colors.reshape(B, N).astype(np.int32)
    b_ix = np.repeat(np.arange(B), N)
    idx1 = np.empty((B, R, C), np.int32)
    idx1[b_ix, r_src.reshape(-1), m.reshape(-1)] = c_src.reshape(-1)
    idx3 = np.empty((B, R, C), np.int32)
    idx3[b_ix, r_dst.reshape(-1), (p % C)[None].repeat(B, 0).reshape(-1)] = \
        m.reshape(-1)
    mid = np.empty((B, C, R), np.int32)
    mid[b_ix, m.reshape(-1), r_dst.reshape(-1)] = r_src.reshape(-1)
    return {"idx1": idx1, "idx3": idx3,
            "mid": _route_tree(mid.reshape(B * C, R), max_leaf)}


def build_cube_plan(gather_idx: np.ndarray) -> CubePlan | None:
    """Build a cube plan for out[p] = in[gather_idx[p]]; None if the size
    is outside the cube executor's range."""
    gather_idx = np.asarray(gather_idx, np.int64)
    n = gather_idx.shape[0]
    L = cube_routable_length(n)
    if L is None:
        return None
    full = np.concatenate([gather_idx, np.arange(n, L, dtype=np.int64)])

    if L <= _SEG * MAX_WIDE:
        W = L // _SEG
        # max_leaf picked so the tree depth is exactly (c, b, wide-W):
        # W <= 128 must keep splitting past W*128-wide rows; W in (128, 512]
        # must stop at the W-wide leaf.
        d0 = _route_tree(full[None, :], MAX_WIDE if W > LANES else LANES)
        d1 = d0["mid"]                       # over [C, W*128]
        leaf = d1["mid"]["leaf"]             # [C*B, W]
        s0 = d0["idx1"].reshape(W, LANES, LANES).astype(np.int8)
        s1 = d1["idx1"].reshape(LANES, W, LANES).transpose(1, 0, 2) \
            .astype(np.int8)                                    # [W, C, B]
        s2 = leaf.reshape(LANES, LANES, W).astype(np.int16)     # [C, B, W]
        s3 = d1["idx3"].reshape(LANES, W, LANES).astype(np.int8)  # [C, W, B]
        s4 = d0["idx3"].reshape(W, LANES, LANES).astype(np.int8)
        return CubePlan(stages=(s0, s1, s2, s3, s4), form="wbc",
                        length=L, wide=W)

    T = L // _CUBE
    d0 = _route_tree(full[None, :], LANES)
    d1 = d0["mid"]                           # over [C, T*F*128]
    d2 = d1["mid"]                           # over [C*B, T*128]
    leaf = d2["mid"]["leaf"]                 # [C*B*F, T]
    F = LANES
    s0 = d0["idx1"].reshape(T, F, LANES, LANES).astype(np.int8)
    s1 = d1["idx1"].reshape(LANES, T, F, LANES).transpose(1, 2, 0, 3) \
        .astype(np.int8)                                  # [T, F, C, B]
    s2 = d2["idx1"].reshape(LANES, LANES, T, F).transpose(0, 2, 1, 3) \
        .astype(np.int8)                                  # [C, T, B, F]
    # t-stage in [C, T', B, F] layout: the kernel runs it as a T-way
    # select-accumulate (out[t'] gathers x[s3[t']] along the T axis) —
    # lane-aligned, no 16-lane-minor transposes
    s3 = leaf.reshape(LANES, LANES, F, T).transpose(0, 3, 1, 2) \
        .astype(np.int8)                                  # [C, T', B, F]
    s4 = d2["idx3"].reshape(LANES, LANES, T, F).transpose(0, 2, 1, 3) \
        .astype(np.int8)                                  # [C, T, B, F]
    s5 = d1["idx3"].reshape(LANES, T, F, LANES).astype(np.int8)  # [C, T, F, B]
    s6 = d0["idx3"].reshape(T, F, LANES, LANES).astype(np.int8)
    return CubePlan(stages=(s0, s1, s2, s3, s4, s5, s6), form="tfbc",
                    length=L, wide=T)


def invert_cube_plan(plan: CubePlan) -> CubePlan:
    """Inverse plan: reversed stage order, row-inverted indices, rearranged
    to each mirrored position's kernel layout."""
    def inv_rows(idx):
        idx = np.asarray(idx)
        w = idx.shape[-1]
        flat = idx.reshape(-1, w).astype(np.int64)
        out = np.empty_like(flat)
        rows = np.arange(flat.shape[0])[:, None]
        out[rows, flat] = np.arange(w, dtype=np.int64)[None, :]
        return out.reshape(idx.shape).astype(idx.dtype)

    s = [np.asarray(a) for a in plan.stages]
    if plan.form == "wbc":
        # mirror pairs: (0,4) same layout; (1,3) [W,C,B]<->[C,W,B]; (2,2) self
        ns = (inv_rows(s[4]),
              inv_rows(s[3]).transpose(1, 0, 2),
              inv_rows(s[2]),
              inv_rows(s[1]).transpose(1, 0, 2),
              inv_rows(s[0]))
    else:
        # (0,6) same; (1,5) [T,F,C,B]<->[C,T,F,B]; (2,4) same; (3,3) self
        # s3 is [C, T', B, F] (select layout): invert along the T' axis
        s3p = s[3].transpose(0, 2, 3, 1)              # [C, B, F, T']
        inv3 = inv_rows(s3p).transpose(0, 3, 1, 2)    # back to [C, T, B, F]
        ns = (inv_rows(s[6]),
              inv_rows(s[5]).transpose(1, 2, 0, 3),
              inv_rows(s[4]),
              inv3,
              inv_rows(s[2]),
              inv_rows(s[1]).transpose(2, 0, 1, 3),
              inv_rows(s[0]))
    return CubePlan(stages=ns, form=plan.form, length=plan.length,
                    wide=plan.wide)


# ------------------------------------------------------------------ #
# reference executor (pure jnp; CPU tests + non-TPU backends)

def _ref_apply(x: jax.Array, plan: CubePlan) -> jax.Array:
    """Stage-by-stage take_along_axis replay of the cube algebra.

    Mirrors the Pallas kernels exactly (same intermediate layouts), so CPU
    tests validate the algebra the TPU path executes."""
    s = [jnp.asarray(a, jnp.int32) for a in plan.stages]
    if plan.form == "wbc":
        W = plan.wide
        a = x.reshape(W, LANES, LANES)                    # [W, B, C]
        a = jnp.take_along_axis(a, s[0], axis=2)          # gather c
        a = jnp.swapaxes(a, 1, 2)                         # [W, C, B]
        a = jnp.take_along_axis(a, s[1], axis=2)          # gather b
        a = jnp.transpose(a, (1, 2, 0))                   # [C, B, W]
        a = jnp.take_along_axis(a, s[2], axis=2)          # gather w (wide)
        a = jnp.swapaxes(a, 1, 2)                         # [C, W, B]
        a = jnp.take_along_axis(a, s[3], axis=2)          # gather b
        a = jnp.transpose(a, (1, 2, 0))                   # [W, B, C]
        a = jnp.take_along_axis(a, s[4], axis=2)          # gather c
        return a.reshape(-1)
    T = plan.wide
    F = LANES
    a = x.reshape(T, F, LANES, LANES)                     # [T, F, B, C]
    a = jnp.take_along_axis(a, s[0], axis=3)              # gather c
    a = jnp.swapaxes(a, 2, 3)                             # [T, F, C, B]
    a = jnp.take_along_axis(a, s[1], axis=3)              # gather b
    a = jnp.transpose(a, (2, 0, 3, 1))                    # [C, T, B, F]
    a = jnp.take_along_axis(a, s[2], axis=3)              # gather f
    a = jnp.take_along_axis(a, s[3], axis=1)              # gather t (select)
    a = jnp.take_along_axis(a, s[4], axis=3)              # gather f
    a = jnp.swapaxes(a, 2, 3)                             # [C, T, F, B]
    a = jnp.take_along_axis(a, s[5], axis=3)              # gather b
    a = jnp.transpose(a, (1, 2, 3, 0))                    # [T, F, B, C]
    a = jnp.take_along_axis(a, s[6], axis=3)              # gather c
    return a.reshape(-1)


# ------------------------------------------------------------------ #
# Pallas kernels
#
# Physical pipeline (per payload batch p; idx blocks are reused across p
# because p is the innermost grid dimension and Mosaic skips re-fetching
# unchanged blocks):
#
#   K1  in  [P, M, B, C]  blocks of 8 m-slices   (M = W or T*F)
#       out [P, C, M, B]  — stages (gather c, tile transpose, gather b)
#   K2  in  [P, C, M, B]  one c-slice per block — all middle stages
#       out [P, C, M, B]
#   K3  in  [P, C, M, B]  blocks of 8 m-slices — (transpose, gather c)
#       out [P, M, B, C]  = flat [P, L]
#
# Mosaic v5e constraints honored: gathers are 2-D int32 lane gathers of
# width 128; the last two dims of every block are (8k, 128) or full;
# int8 payloads stay int8 in HBM (widened only inside VMEM).

_MSLAB = 8


def _widen(v):
    return v if v.dtype == jnp.int32 else v.astype(jnp.int32)


def _g2(x, idx):
    """Batched lane gather: collapse all but the minor axis to rows."""
    shp = x.shape
    x2 = x.reshape(-1, shp[-1])
    i2 = idx.astype(jnp.int32).reshape(-1, shp[-1])
    return jnp.take_along_axis(x2, i2, axis=1).reshape(shp)


def _block_cumsum(x3, carry_ref, exclusive, scan_f32):
    """Scan an [8, B, C] block in flat element order with an SMEM carry
    per payload (grid = (m, p), m outer — carry is sequential in m).

    scan_f32: the int32 carrier holds float32 bits — scan in real float
    arithmetic (deterministic) and bitcast back."""
    from jax.experimental import pallas as pl
    from essentials_tpu.ops.scan_kernels import _block_scan
    p = pl.program_id(1)
    v = x3.reshape(_MSLAB * LANES, LANES)
    if scan_f32:
        v = jax.lax.bitcast_convert_type(v, jnp.float32)
    ident = jnp.zeros((), v.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_ref[p] = ident

    incl, _, (tot, _) = _block_scan(v, None, jnp.add, ident, False)
    c0 = carry_ref[p]
    out = (incl - v if exclusive else incl) + c0
    carry_ref[p] = c0 + tot
    if scan_f32:
        out = jax.lax.bitcast_convert_type(out, jnp.int32)
    return out.reshape(_MSLAB, LANES, LANES)


def _k1_kernel(pre_scan, scan_f32, x_ref, i0_ref, i1_ref, o_ref, *scratch):
    """8 m-slices: [exclusive pre-scan,] gather c, transpose, gather b;
    emit [C, 8, B]."""
    x = _widen(x_ref[0])                                  # [8, B, C]
    if pre_scan:
        x = _block_cumsum(x, scratch[0], True, scan_f32)
    x = _g2(x, i0_ref[...])
    x = jnp.swapaxes(x, 1, 2)                             # [8, C, B]
    x = _g2(x, i1_ref[...])
    out = jnp.swapaxes(x, 0, 1)                           # [C, 8, B]
    o_ref[0] = out if out.dtype == o_ref.dtype else out.astype(o_ref.dtype)


def _k3_kernel(post_scan, scan_f32, x_ref, i_ref, o_ref, *scratch):
    """8 m-slices: transpose back, gather c [, inclusive post-scan];
    emit flat [8, B, C]."""
    x = _widen(x_ref[0])                                  # [C, 8, B]
    x = jnp.swapaxes(x, 0, 1)                             # [8, C, B]
    x = jnp.swapaxes(x, 1, 2)                             # [8, B, C]
    x = _g2(x, i_ref[...])
    if post_scan:
        x = _block_cumsum(x, scratch[0], False, scan_f32)
    o_ref[0] = x if x.dtype == o_ref.dtype else x.astype(o_ref.dtype)


def _k2_wbc_kernel(W, x_ref, iw_ref, ib_ref, o_ref):
    """One c-slice: wide gather along w (chunked 128x128 transposes + lane
    gathers + selects), then gather b."""
    k = -(-W // LANES)
    Wp = k * LANES
    x = _widen(x_ref[0, 0])                               # [W, B]
    if Wp != W:
        x = jnp.concatenate(
            [x, jnp.zeros((Wp - W, LANES), jnp.int32)], axis=0)
    xt = jnp.swapaxes(x.reshape(k, LANES, LANES), 1, 2)   # [k, B, 128(w_lo)]
    iw = iw_ref[0].astype(jnp.int32)                      # [B, W]
    out_chunks = []
    for jj in range(k):
        w0 = jj * LANES
        w1 = min(w0 + LANES, W)
        idx = iw[:, w0:w1]
        if w1 - w0 < LANES:
            idx = jnp.concatenate(
                [idx, jnp.zeros((LANES, LANES - (w1 - w0)), jnp.int32)],
                axis=1)
        lo = idx & (LANES - 1)
        hi = idx >> 7
        acc = jnp.zeros((LANES, LANES), jnp.int32)        # [B, 128(w_out)]
        for j in range(k):
            gj = jnp.take_along_axis(xt[j], lo, axis=1)
            acc = jnp.where(hi == j, gj, acc) if k > 1 else gj
        out_chunks.append(acc.T)                          # [128(w_out), B]
    a = (jnp.concatenate(out_chunks, axis=0) if k > 1
         else out_chunks[0])[:W]                          # [W, B]
    a = jnp.take_along_axis(a, ib_ref[0].astype(jnp.int32), axis=1)
    o_ref[0, 0] = a if a.dtype == o_ref.dtype else a.astype(o_ref.dtype)


def _k2_tfbc_kernel(T, x_ref, i2_ref, i3_ref, i4_ref, i5_ref, o_ref):
    """One c-slice: gather f, T-way select over t, gather f, gather b.

    The t stage is a select-accumulate over the (small, <= 40) T axis in
    lane-aligned [T, B, F] layout — replacing the previous
    transpose -> 16-lane-minor gather -> transpose sandwich that cost ~7
    normal passes in Mosaic relayouts."""
    F = LANES
    x = _widen(x_ref[0, 0]).reshape(T, F, LANES)          # [T, F, B]
    a = jnp.swapaxes(x, 1, 2)                             # [T, B, F]
    a = _g2(a, i2_ref[0])                                 # gather f
    i3 = i3_ref[0].astype(jnp.int32)                      # [T', B, F]
    acc = jnp.zeros_like(a)
    for t in range(T):                                    # gather t (select)
        acc = jnp.where(i3 == t, a[t][None], acc)
    a = _g2(acc, i4_ref[0])                               # gather f
    a = jnp.swapaxes(a, 1, 2)                             # [T, F, B]
    a = _g2(a, i5_ref[0])                                 # gather b
    a = a.reshape(T * F, LANES)
    o_ref[0, 0] = a if a.dtype == o_ref.dtype else a.astype(o_ref.dtype)


def _pallas_apply(xs: tuple, plan: CubePlan, pre_scan: bool = False,
                  post_scan: bool = False, scan_f32: bool = False) -> tuple:
    """Apply the plan to P same-dtype payloads stacked [P, L].

    pre_scan: exclusive int32 cumsum of each payload BEFORE routing (fused
    into K1). post_scan: inclusive int32 cumsum AFTER routing (fused into
    K3). Both assume an int32 carrier with wrap-around semantics."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.stack(xs)                                     # [P, L]
    P = x.shape[0]
    dt = x.dtype
    L = plan.length
    s = [jnp.asarray(a) for a in plan.stages]

    def bs(shp, im):
        return pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)

    if plan.form == "wbc":
        M = plan.wide                                     # W (multiple of 8)
        i0 = s[0]                                         # [W, B, C]
        i1 = s[1]                                         # [W, C, B]
        iw, ib = s[2], s[3]                               # [C, B, W] [C, W, B]
        i6 = s[4]                                         # [W, B, C]
        k2_kernel = partial(_k2_wbc_kernel, M)
        k2_idx = [(iw, bs((1, LANES, M), lambda c, p: (c, 0, 0))),
                  (ib, bs((1, M, LANES), lambda c, p: (c, 0, 0)))]
    else:
        T = plan.wide
        M = T * LANES
        i0 = s[0].reshape(M, LANES, LANES)
        i1 = s[1].reshape(M, LANES, LANES)                # [T*F, C, B]
        i6 = s[6].reshape(M, LANES, LANES)
        k2_kernel = partial(_k2_tfbc_kernel, T)
        k2_idx = [(s[2], bs((1, T, LANES, LANES), lambda c, p: (c, 0, 0, 0))),
                  (s[3], bs((1, T, LANES, LANES), lambda c, p: (c, 0, 0, 0))),
                  (s[4], bs((1, T, LANES, LANES), lambda c, p: (c, 0, 0, 0))),
                  (s[5], bs((1, T, LANES, LANES), lambda c, p: (c, 0, 0, 0)))]

    xm = x.reshape(P, M, LANES, LANES)                    # [P, M, B, C]
    scan_scratch = [pltpu.SMEM((P,), jnp.float32 if scan_f32 else jnp.int32)]
    k1 = pl.pallas_call(
        partial(_k1_kernel, pre_scan, scan_f32), grid=(M // _MSLAB, P),
        in_specs=[bs((1, _MSLAB, LANES, LANES), lambda m, p: (p, m, 0, 0)),
                  bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0)),
                  bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0))],
        out_specs=bs((1, LANES, _MSLAB, LANES), lambda m, p: (p, 0, m, 0)),
        out_shape=jax.ShapeDtypeStruct((P, LANES, M, LANES), dt),
        scratch_shapes=scan_scratch if pre_scan else [],
    )(xm, i0, i1)                                         # [P, C, M, B]

    k2 = pl.pallas_call(
        k2_kernel, grid=(LANES, P),
        in_specs=[bs((1, 1, M, LANES), lambda c, p: (p, c, 0, 0))]
        + [spec for _, spec in k2_idx],
        out_specs=bs((1, 1, M, LANES), lambda c, p: (p, c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((P, LANES, M, LANES), dt),
        # tfbc only: the middle chain keeps several [T,B,F] i32 temporaries
        # live and the default 16M scoped-vmem estimate rejects T >= ~12.
        # Leave wbc at the default — a raised limit changes Mosaic's
        # scheduling there and measured 2.5x slower end-to-end.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
        if plan.form == "tfbc" else None,
    )(k1, *[a for a, _ in k2_idx])                        # [P, C, M, B]

    k3 = pl.pallas_call(
        partial(_k3_kernel, post_scan, scan_f32), grid=(M // _MSLAB, P),
        in_specs=[bs((1, LANES, _MSLAB, LANES), lambda m, p: (p, 0, m, 0)),
                  bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0))],
        out_specs=bs((1, _MSLAB, LANES, LANES), lambda m, p: (p, m, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((P, M, LANES, LANES), dt),
        scratch_shapes=scan_scratch if post_scan else [],
    )(k2, i6)
    out = k3.reshape(P, L)
    return tuple(out[i] for i in range(P))


def apply_cube_plan(xs, plan: CubePlan, n_valid: int | None = None,
                    *, use_pallas: bool | None = None,
                    pre_scan_exclusive: bool = False,
                    post_scan: bool = False):
    """Apply the routed permutation to payloads (mixed dtypes OK).

    All payloads ride a 32-bit carrier: the kernels are VPU-bound (gathers
    and tile transposes at ~8 elem/cycle), so int8's 4x HBM saving measured
    SLOWER than int32 on v5e (0.43 vs 0.26 ms at 7.7M) — the per-block
    widen/narrow converts cost more than the saved DMA. Set
    ``narrow_carrier=True`` on HBM-starved parts if that tradeoff flips."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    n = xs[0].shape[0]
    n_valid = n if n_valid is None else n_valid
    L = plan.length
    narrow_carrier = False
    scans = pre_scan_exclusive or post_scan
    scan_f32 = False
    if scans:
        # fused scans: int32 wrap-around for integer payloads (the
        # telescoping expansion runs float payloads through bit-diffs, so
        # it is int32 by construction); float32 payloads scan in real
        # float arithmetic (deterministic) via in-kernel bitcasts
        n_float = sum(jnp.issubdtype(x.dtype, jnp.floating) for x in xs)
        assert n_float in (0, len(xs)), \
            "fused route scans: payloads must be all-int or all-float32"
        scan_f32 = n_float > 0

    carriers, lanes8, lanes32 = [], [], []
    for i, x in enumerate(xs):
        dt = x.dtype
        if use_pallas and narrow_carrier and not scans and \
                dt in (jnp.int8, jnp.uint8, jnp.bool_):
            c = x.astype(jnp.int8)
            lanes8.append(i)
        elif dt in (jnp.float32, jnp.uint32):
            c = jax.lax.bitcast_convert_type(x, jnp.int32)
            lanes32.append(i)
        else:
            c = x.astype(jnp.int32)
            lanes32.append(i)
        if n < L:
            c = jnp.pad(c, (0, L - n))
        carriers.append(c)

    outs: list = [None] * len(xs)
    for group in (lanes8, lanes32):
        if not group:
            continue
        grp = tuple(carriers[i] for i in group)
        if use_pallas:
            res = _pallas_apply(grp, plan, pre_scan=pre_scan_exclusive,
                                post_scan=post_scan, scan_f32=scan_f32)
        else:
            def _sc(g, f):
                if scan_f32:
                    g = jax.lax.bitcast_convert_type(g, jnp.float32)
                g = f(g)
                if scan_f32:
                    g = jax.lax.bitcast_convert_type(g, jnp.int32)
                return g
            if pre_scan_exclusive:
                grp = tuple(_sc(g, lambda v: jnp.concatenate(
                    [jnp.zeros(1, v.dtype), jnp.cumsum(v)])[:-1])
                    for g in grp)
            res = tuple(_ref_apply(g, plan) for g in grp)
            if post_scan:
                res = tuple(_sc(r, jnp.cumsum) for r in res)
        for i, r in zip(group, res):
            outs[i] = r

    if scans:
        # scanned outputs are raw prefix arrays: int32, or float32 bits
        if scan_f32:
            return tuple(jax.lax.bitcast_convert_type(o[:n_valid],
                                                      jnp.float32)
                         for o in outs)
        return tuple(o[:n_valid] for o in outs)
    results = []
    for x, o in zip(xs, outs):
        dt = x.dtype
        o = o[:n_valid]
        if dt in (jnp.float32, jnp.uint32):
            o = jax.lax.bitcast_convert_type(o, dt)
        elif dt == jnp.bool_:
            o = o != 0
        elif o.dtype != dt:
            o = o.astype(dt)
        results.append(o)
    return tuple(results)


# ------------------------------------------------------------------ #
# chained application: route_a -> inclusive scan -> route_b
#
# The expand -> CSR->CSC advance pipeline runs two full routes with a
# cumsum between (ops/advance.py). Fusing route_a's last kernel, the scan,
# and route_b's first kernel into ONE pallas_call saves an HBM round trip
# of every payload per superstep.

def _kmid_kernel(scan_f32, xa_ref, i6a_ref, i0b_ref, i1b_ref, o_ref,
                 carry_ref, *, exclusive=False):
    """K3(plan_a) + [in|ex]clusive scan + K1(plan_b) on one m-slab."""
    x = _widen(xa_ref[0])                                 # [C, 8, B]
    x = jnp.swapaxes(x, 0, 1)                             # [8, C, B]
    x = jnp.swapaxes(x, 1, 2)                             # [8, B, C]
    x = _g2(x, i6a_ref[...])                              # finish route_a
    x = _block_cumsum(x, carry_ref, exclusive, scan_f32)  # fused scan
    x = _g2(x, i0b_ref[...])                              # start route_b
    x = jnp.swapaxes(x, 1, 2)                             # [8, C, B]
    x = _g2(x, i1b_ref[...])
    out = jnp.swapaxes(x, 0, 1)                           # [C, 8, B]
    o_ref[0] = out if out.dtype == o_ref.dtype else out.astype(o_ref.dtype)


def chainable(plan_a, plan_b) -> bool:
    return (isinstance(plan_a, CubePlan) and isinstance(plan_b, CubePlan)
            and plan_a.form == plan_b.form
            and plan_a.length == plan_b.length)


def apply_cube_chain(xs, plan_a: CubePlan, plan_b: CubePlan,
                     n_valid: int | None = None,
                     *, use_pallas: bool | None = None):
    """out = route_b(cumsum(route_a(x))) for every payload, with the
    middle K3a/scan/K1b fused. int32 wrap-around scan semantics (the
    telescoping expansion's contract). Requires chainable(plan_a, plan_b).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert chainable(plan_a, plan_b)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    n = xs[0].shape[0]
    n_valid = n if n_valid is None else n_valid
    L = plan_a.length

    dtypes_in = [x.dtype for x in xs]
    carriers = []
    for x in xs:
        if x.dtype in (jnp.float32, jnp.uint32):
            x = jax.lax.bitcast_convert_type(x, jnp.int32)
        elif x.dtype != jnp.int32:
            x = x.astype(jnp.int32)
        if n < L:
            x = jnp.pad(x, (0, L - n))
        carriers.append(x)

    if not use_pallas:
        mids = [jnp.cumsum(_ref_apply(c, plan_a)) for c in carriers]
        outs = [_ref_apply(m, plan_b) for m in mids]
    else:
        sa = [jnp.asarray(a) for a in plan_a.stages]
        sb = [jnp.asarray(a) for a in plan_b.stages]
        P = len(carriers)
        x = jnp.stack(carriers)
        dt = x.dtype

        def bs(shp, im):
            return pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)

        if plan_a.form == "wbc":
            M = plan_a.wide
            i0a, i1a, i6a = sa[0], sa[1], sa[4]
            i0b, i1b, i6b = sb[0], sb[1], sb[4]
            k2a_kernel = partial(_k2_wbc_kernel, M)
            k2a_idx = [(sa[2], bs((1, LANES, M), lambda c, p: (c, 0, 0))),
                       (sa[3], bs((1, M, LANES), lambda c, p: (c, 0, 0)))]
            k2b_kernel = partial(_k2_wbc_kernel, M)
            k2b_idx = [(sb[2], bs((1, LANES, M), lambda c, p: (c, 0, 0))),
                       (sb[3], bs((1, M, LANES), lambda c, p: (c, 0, 0)))]
        else:
            T = plan_a.wide
            M = T * LANES
            i0a = sa[0].reshape(M, LANES, LANES)
            i1a = sa[1].reshape(M, LANES, LANES)
            i6a = sa[6].reshape(M, LANES, LANES)
            i0b = sb[0].reshape(M, LANES, LANES)
            i1b = sb[1].reshape(M, LANES, LANES)
            i6b = sb[6].reshape(M, LANES, LANES)
            k2a_kernel = partial(_k2_tfbc_kernel, T)
            k2a_idx = [
                (sa[2], bs((1, T, LANES, LANES), lambda c, p: (c, 0, 0, 0))),
                (sa[3], bs((1, T, LANES, LANES), lambda c, p: (c, 0, 0, 0))),
                (sa[4], bs((1, T, LANES, LANES), lambda c, p: (c, 0, 0, 0))),
                (sa[5], bs((1, T, LANES, LANES), lambda c, p: (c, 0, 0, 0)))]
            k2b_idx = [
                (sb[2], bs((1, T, LANES, LANES), lambda c, p: (c, 0, 0, 0))),
                (sb[3], bs((1, T, LANES, LANES), lambda c, p: (c, 0, 0, 0))),
                (sb[4], bs((1, T, LANES, LANES), lambda c, p: (c, 0, 0, 0))),
                (sb[5], bs((1, T, LANES, LANES), lambda c, p: (c, 0, 0, 0)))]
            k2b_kernel = partial(_k2_tfbc_kernel, T)

        vmem = (pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
                if plan_a.form == "tfbc" else None)
        xm = x.reshape(P, M, LANES, LANES)
        k1 = pl.pallas_call(
            partial(_k1_kernel, False, False), grid=(M // _MSLAB, P),
            in_specs=[bs((1, _MSLAB, LANES, LANES),
                         lambda m, p: (p, m, 0, 0)),
                      bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0)),
                      bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0))],
            out_specs=bs((1, LANES, _MSLAB, LANES), lambda m, p: (p, 0, m, 0)),
            out_shape=jax.ShapeDtypeStruct((P, LANES, M, LANES), dt),
        )(xm, i0a, i1a)
        k2a = pl.pallas_call(
            k2a_kernel, grid=(LANES, P),
            in_specs=[bs((1, 1, M, LANES), lambda c, p: (p, c, 0, 0))]
            + [spec for _, spec in k2a_idx],
            out_specs=bs((1, 1, M, LANES), lambda c, p: (p, c, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((P, LANES, M, LANES), dt),
            compiler_params=vmem,
        )(k1, *[a for a, _ in k2a_idx])
        kmid = pl.pallas_call(
            partial(_kmid_kernel, False), grid=(M // _MSLAB, P),
            in_specs=[bs((1, LANES, _MSLAB, LANES), lambda m, p: (p, 0, m, 0)),
                      bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0)),
                      bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0)),
                      bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0))],
            out_specs=bs((1, LANES, _MSLAB, LANES), lambda m, p: (p, 0, m, 0)),
            out_shape=jax.ShapeDtypeStruct((P, LANES, M, LANES), dt),
            scratch_shapes=[pltpu.SMEM((P,), jnp.int32)],
        )(k2a, i6a, i0b, i1b)
        k2b = pl.pallas_call(
            k2b_kernel, grid=(LANES, P),
            in_specs=[bs((1, 1, M, LANES), lambda c, p: (p, c, 0, 0))]
            + [spec for _, spec in k2b_idx],
            out_specs=bs((1, 1, M, LANES), lambda c, p: (p, c, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((P, LANES, M, LANES), dt),
            compiler_params=vmem,
        )(kmid, *[a for a, _ in k2b_idx])
        k3 = pl.pallas_call(
            partial(_k3_kernel, False, False), grid=(M // _MSLAB, P),
            in_specs=[bs((1, LANES, _MSLAB, LANES), lambda m, p: (p, 0, m, 0)),
                      bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0))],
            out_specs=bs((1, _MSLAB, LANES, LANES), lambda m, p: (p, m, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((P, M, LANES, LANES), dt),
        )(k2b, i6b)
        outs = [k3.reshape(P, L)[i] for i in range(P)]

    results = []
    for dt_in, o in zip(dtypes_in, outs):
        o = o[:n_valid]
        if dt_in in (jnp.float32, jnp.uint32):
            o = jax.lax.bitcast_convert_type(o, dt_in)
        elif dt_in == jnp.bool_:
            o = o != 0
        elif o.dtype != dt_in:
            o = o.astype(dt_in)
        results.append(o)
    return tuple(results)


# ------------------------------------------------------------------ #
# N-route mega-chain: route_1 -> scan -> route_2 -> scan -> ... -> route_N
#
# The full dense advance superstep is THREE routes with a scan at each
# boundary (expand-offsets route + inclusive telescoping cumsum, CSR->CSC
# route + exclusive combine prescan, inverse-offsets route). Chaining all
# of them turns 9 kernels + 2 inter-kernel elementwise HBM round trips
# into 2N+1 = 7 kernels with zero glue — the whole superstep's edge-axis
# work in one fused pipeline (VERDICT round-1 next-step #1).

def chainable_n(plans) -> bool:
    return all(isinstance(p, CubePlan) for p in plans) and \
        len({(p.form, p.length) for p in plans}) == 1


def _plan_kparts(plan: CubePlan, bs):
    """(i0, i1, i6, k2_kernel, k2_idx) with i* reshaped to [M, B, C]."""
    s = [jnp.asarray(a) for a in plan.stages]
    if plan.form == "wbc":
        M = plan.wide
        k2_kernel = partial(_k2_wbc_kernel, M)
        k2_idx = [(s[2], bs((1, LANES, M), lambda c, p: (c, 0, 0))),
                  (s[3], bs((1, M, LANES), lambda c, p: (c, 0, 0)))]
        return s[0], s[1], s[4], k2_kernel, k2_idx
    T = plan.wide
    M = T * LANES
    k2_kernel = partial(_k2_tfbc_kernel, T)
    k2_idx = [(s[2], bs((1, T, LANES, LANES), lambda c, p: (c, 0, 0, 0))),
              (s[3], bs((1, T, LANES, LANES), lambda c, p: (c, 0, 0, 0))),
              (s[4], bs((1, T, LANES, LANES), lambda c, p: (c, 0, 0, 0))),
              (s[5], bs((1, T, LANES, LANES), lambda c, p: (c, 0, 0, 0)))]
    return (s[0].reshape(M, LANES, LANES), s[1].reshape(M, LANES, LANES),
            s[6].reshape(M, LANES, LANES), k2_kernel, k2_idx)


def apply_cube_chain_n(xs, plans, scans, n_valid: int | None = None,
                       *, use_pallas: bool | None = None):
    """out = route_N(scan_{N-1}(... route_2(scan_1(route_1(x))) ...)).

    ``plans``: sequence of chainable CubePlans. ``scans``: N-1 entries from
    {"incl", "excl"} — the fused int32 wrap-around cumsum applied between
    consecutive routes (in the intermediate edge order). Payloads ride an
    int32 carrier; float32 inputs are bitcast (scans then operate on BITS —
    only meaningful for telescoped integer diffs, as in ops/segment.py).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plans = list(plans)
    scans = list(scans)
    assert len(scans) == len(plans) - 1 and chainable_n(plans)
    assert all(s in ("incl", "excl") for s in scans)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    n = xs[0].shape[0]
    n_valid = n if n_valid is None else n_valid
    L = plans[0].length

    dtypes_in = [x.dtype for x in xs]
    carriers = []
    for x in xs:
        if x.dtype in (jnp.float32, jnp.uint32):
            x = jax.lax.bitcast_convert_type(x, jnp.int32)
        elif x.dtype != jnp.int32:
            x = x.astype(jnp.int32)
        if n < L:
            x = jnp.pad(x, (0, L - n))
        carriers.append(x)

    if not use_pallas:
        outs = []
        for c in carriers:
            v = c
            for i, plan in enumerate(plans):
                v = _ref_apply(v, plan)
                if i < len(scans):
                    s = jnp.cumsum(v)
                    v = s - v if scans[i] == "excl" else s
            outs.append(v)
    else:
        P = len(carriers)
        x = jnp.stack(carriers)
        dt = x.dtype

        def bs(shp, im):
            return pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)

        parts = [_plan_kparts(p, bs) for p in plans]
        M = plans[0].wide if plans[0].form == "wbc" \
            else plans[0].wide * LANES
        vmem = (pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
                if plans[0].form == "tfbc" else None)

        def run_k2(v, k2_kernel, k2_idx):
            return pl.pallas_call(
                k2_kernel, grid=(LANES, P),
                in_specs=[bs((1, 1, M, LANES), lambda c, p: (p, c, 0, 0))]
                + [spec for _, spec in k2_idx],
                out_specs=bs((1, 1, M, LANES), lambda c, p: (p, c, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((P, LANES, M, LANES), dt),
                compiler_params=vmem,
            )(v, *[a for a, _ in k2_idx])

        i0_0, i1_0, _, k2k_0, k2i_0 = parts[0]
        xm = x.reshape(P, M, LANES, LANES)
        v = pl.pallas_call(
            partial(_k1_kernel, False, False), grid=(M // _MSLAB, P),
            in_specs=[bs((1, _MSLAB, LANES, LANES),
                         lambda m, p: (p, m, 0, 0)),
                      bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0)),
                      bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0))],
            out_specs=bs((1, LANES, _MSLAB, LANES), lambda m, p: (p, 0, m, 0)),
            out_shape=jax.ShapeDtypeStruct((P, LANES, M, LANES), dt),
        )(xm, i0_0, i1_0)
        v = run_k2(v, k2k_0, k2i_0)

        for i in range(1, len(plans)):
            i6_prev = parts[i - 1][2]
            i0_i, i1_i, _, k2k_i, k2i_i = parts[i]
            v = pl.pallas_call(
                partial(_kmid_kernel, False,
                        exclusive=(scans[i - 1] == "excl")),
                grid=(M // _MSLAB, P),
                in_specs=[bs((1, LANES, _MSLAB, LANES),
                             lambda m, p: (p, 0, m, 0)),
                          bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0)),
                          bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0)),
                          bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0))],
                out_specs=bs((1, LANES, _MSLAB, LANES),
                             lambda m, p: (p, 0, m, 0)),
                out_shape=jax.ShapeDtypeStruct((P, LANES, M, LANES), dt),
                scratch_shapes=[pltpu.SMEM((P,), jnp.int32)],
            )(v, i6_prev, i0_i, i1_i)
            v = run_k2(v, k2k_i, k2i_i)

        v = pl.pallas_call(
            partial(_k3_kernel, False, False), grid=(M // _MSLAB, P),
            in_specs=[bs((1, LANES, _MSLAB, LANES), lambda m, p: (p, 0, m, 0)),
                      bs((_MSLAB, LANES, LANES), lambda m, p: (m, 0, 0))],
            out_specs=bs((1, _MSLAB, LANES, LANES), lambda m, p: (p, m, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((P, M, LANES, LANES), dt),
        )(v, parts[-1][2])
        outs = [v.reshape(P, L)[i] for i in range(P)]

    results = []
    for dt_in, o in zip(dtypes_in, outs):
        o = o[:n_valid]
        if dt_in in (jnp.float32, jnp.uint32):
            o = jax.lax.bitcast_convert_type(o, dt_in)
        elif dt_in == jnp.bool_:
            o = o != 0
        elif o.dtype != dt_in:
            o = o.astype(dt_in)
        results.append(o)
    return tuple(results)
