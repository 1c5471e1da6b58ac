"""Bitmap-row intersection engine (triangle counting's hot kernel).

Reference parity: graph::get_intersection_count — the per-edge sorted
two-pointer set intersection that powers gunrock::tc
(/root/reference/include/gunrock/graph/csr.hxx:110-167,
algorithms/tc.hxx:75-93). A serial two-pointer walk is hostile to the TPU;
this kernel reformulates intersection as *bitmap AND at HBM rate*:

  host: pack each vertex's oriented out-neighborhood into a V-bit row
        (uint32 words, [V+1, R, 128]; row V is all-zero for pad edges)
  device (Pallas): for every oriented edge (u, v), DMA rows B[u] and B[v]
        from HBM into a double-buffered VMEM ring, compute
        W = B[u] & B[v] on the VPU, then
          cnt[e]   = popcount(W)             (SWAR, no hardware popcount)
          crole   += per-bit unpack of W     (witness-role accumulator,
                                              [32, R, 128] int32 in VMEM)

Per edge the traffic is two V-bit rows (2 * V/8 bytes) — for V=64K that is
16 KB/edge, so a 1M-edge graph moves ~16 GB: ~20 ms of HBM time on a v5e,
vs minutes for the host-expanded wedge-sort path it replaces. The VPU does
V bit-ANDs per edge at 8192 bit-lanes/cycle; the witness unpack (V adds at
1024 int32-lanes/cycle) dominates compute.

The edge list arrives in SMEM blocks (scalar-readable for the dynamic DMA
row indices); count output is per-edge; the witness accumulator rides the
whole grid in one revisited VMEM block.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_EDGE_BLOCK = 1024           # edges per grid step (1-D SMEM blocks must be
                             # 1024-element tiled to match XLA's layout)
_NBUF = 16                   # v-row DMA ring depth
_LOOKAHEAD = 12              # v-row prefetch distance (hides ~µs DMA latency)
_INTERPRET = False           # set True in tests to run the kernel on CPU


def _interp():
    return _INTERPRET or jax.default_backend() != "tpu"


def _popc(x):
    """Per-lane popcount of int32 bit-words (SWAR; wrap-around exact)."""
    s = jax.lax.shift_right_logical
    x = x - (s(x, 1) & 0x55555555)
    x = (x & 0x33333333) + (s(x, 2) & 0x33333333)
    x = (x + s(x, 4)) & 0x0F0F0F0F
    return s(x * 0x01010101, 24)


def _kernel(witness, eu_ref, ev_ref, b_hbm, cnt_ref, crole_ref,
            vrows, urow, vsems, usem, cur_u):
    """One grid step: _EDGE_BLOCK edges.

    v-rows stream through a deep DMA ring (_NBUF slots, _LOOKAHEAD
    prefetch). The u-row sits in a single buffer refreshed only when the
    source vertex changes — the edge list is CSR-sorted, so that is once
    per vertex, not once per edge. cur_u (SMEM scratch) carries the loaded
    row id across grid steps (the grid is sequential)."""
    eb = eu_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        crole_ref[...] = jnp.zeros_like(crole_ref)
        cur_u[0] = jnp.int32(-1)

    def vdma(slot, row_idx):
        return pltpu.make_async_copy(
            b_hbm.at[row_idx], vrows.at[slot], vsems.at[slot])

    for k in range(_LOOKAHEAD):                # warm the ring
        vdma(k % _NBUF, ev_ref[k % eb]).start()

    def body(e, crole):
        nxt = e + _LOOKAHEAD                   # keep _LOOKAHEAD in flight

        @pl.when(nxt < eb)
        def _():
            vdma(nxt % _NBUF, ev_ref[nxt]).start()

        u = eu_ref[e]

        @pl.when(u != cur_u[0])                # u changed: refresh (rare)
        def _():
            cp = pltpu.make_async_copy(b_hbm.at[u], urow, usem)
            cp.start()
            cp.wait()
            cur_u[0] = u

        slot = e % _NBUF
        vdma(slot, ev_ref[e]).wait()
        w = urow[...] & vrows[slot]            # [R, 128] int32 bit-words
        cnt_ref[e] = jnp.sum(_popc(w))
        if witness:
            s = jax.lax.shift_right_logical
            unpacked = jnp.stack(
                [(s(w, k) & 1) for k in range(32)])     # [32, R, 128]
            crole = crole + unpacked
        return crole

    crole = jax.lax.fori_loop(0, eb, body,
                              crole_ref[...] if witness else
                              jnp.zeros((1, 1, 1), jnp.int32))
    if witness:
        crole_ref[...] = crole


@partial(jax.jit, static_argnames=("witness",))
def bitmap_intersect_counts(eu: jax.Array, ev: jax.Array, bitmap: jax.Array,
                            *, witness: bool = True):
    """Per-edge intersection counts + per-vertex witness counts.

    eu, ev: int32[E2] row indices (E2 a multiple of _EDGE_BLOCK; pad edges
    must point at the all-zero row). bitmap: int32[Vrows, R, 128] packed
    neighborhoods (bit c of row u set iff edge u->c; c = word*32 + bit,
    word = r*128 + lane). Returns (cnt int32[E2], crole int32[32, R, 128])
    where crole[k, r, l] = number of (edge, witness) pairs with witness
    vertex c = (r*128 + l)*32 + k.
    """
    e2 = eu.shape[0]
    _, R, _ = bitmap.shape
    nblocks = e2 // _EDGE_BLOCK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((_EDGE_BLOCK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_EDGE_BLOCK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),          # bitmap stays HBM
        ],
        out_specs=[
            pl.BlockSpec((_EDGE_BLOCK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((32, R, LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),      # revisited accum
        ],
        scratch_shapes=[
            pltpu.VMEM((_NBUF, R, LANES), jnp.int32),   # v-row ring
            pltpu.VMEM((R, LANES), jnp.int32),          # current u row
            pltpu.SemaphoreType.DMA((_NBUF,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SMEM((1,), jnp.int32),                # loaded u id
        ],
    )
    return pl.pallas_call(
        partial(_kernel, witness),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((e2,), jnp.int32),
                   jax.ShapeDtypeStruct((32, R, LANES), jnp.int32)],
        interpret=_interp(),
    )(eu, ev, bitmap)


def pack_bitmap_rows(n_rows: int, src: np.ndarray, dst: np.ndarray
                     ) -> np.ndarray:
    """Host: pack edges (src->dst) into [n_rows+1, R, 128] int32 bit rows
    (row n_rows left all-zero for pad edges)."""
    words = -(-n_rows // 32)
    R = max(-(-words // LANES), 1)
    b = np.zeros((n_rows + 1, R * LANES), np.uint32)
    np.bitwise_or.at(b, (src, dst >> 5), np.uint32(1) << (dst & 31))
    return b.view(np.int32).reshape(n_rows + 1, R, LANES)


def unpack_witness_counts(crole: np.ndarray, n_rows: int) -> np.ndarray:
    """Host: [32, R, 128] accumulator -> per-vertex counts [n_rows]."""
    k, r, l = np.indices(crole.shape)
    vertex = (r * LANES + l) * 32 + k
    out = np.zeros(n_rows, np.int64)
    flat_v = vertex.reshape(-1)
    keep = flat_v < n_rows
    np.add.at(out, flat_v[keep], crole.reshape(-1)[keep])
    return out
