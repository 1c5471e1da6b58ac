"""SpGEMM: C = A @ B, both sparse CSR.

Reference parity: gunrock::spgemm (/root/reference/include/gunrock/
algorithms/spgemm.hxx:116-240): Gustavson with an upper-bound nnz
pre-allocation, numeric phase, then fix-up compaction (and a noted WIP bug at
:178 — this implementation is correct). TPU-native: the product expansion
layout (one slot per (A(i,k), B(k,j)) pair) is precomputed on the host —
it is graph-static — and the device does gather-multiply, key sort, and a
segmented sum, all static-shape ops; duplicate (i,j) keys compact via
cumsum flags.
"""

from __future__ import annotations

from typing import NamedTuple
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from essentials_tpu.formats.csr import Csr
from essentials_tpu.errors import throw_if
from essentials_tpu.utils.timer import Timer


class SpgemmResult(NamedTuple):
    c: Csr
    elapsed_ms: float


@partial(jax.jit, static_argnums=(4,))
def _numeric_kernel(rows, cols, a_vals, b_vals, W):
    """Sort products by (row, col) and sum duplicates.

    Returns (unique rows, unique cols — padded with INT32_MAX —, summed
    values, unique count). int32-only keys (no x64 dependency)."""
    prod = a_vals * b_vals
    order = jnp.lexsort((cols, rows))
    sr, sc, sv = rows[order], cols[order], prod[order]
    change = (sr[1:] != sr[:-1]) | (sc[1:] != sc[:-1])
    newseg = jnp.concatenate([jnp.ones(1, jnp.int32),
                              change.astype(jnp.int32)])
    seg = jnp.cumsum(newseg) - 1
    summed = jax.ops.segment_sum(sv, seg, num_segments=W,
                                 indices_are_sorted=True)
    nnz = seg[-1] + 1
    pad = jnp.iinfo(jnp.int32).max
    ur = jnp.full(W, pad, jnp.int32).at[seg].min(sr)
    uc = jnp.full(W, pad, jnp.int32).at[seg].min(sc)
    return ur, uc, summed, nnz


def run(a: Csr, b: Csr, *, warmup: bool = True) -> SpgemmResult:
    throw_if(a.n_cols != b.n_rows, "spgemm: inner dimensions disagree")
    a_off = np.asarray(a.row_offsets, np.int64)
    a_cols = np.asarray(a.col_indices, np.int64)
    b_off = np.asarray(b.row_offsets, np.int64)
    b_cols = np.asarray(b.col_indices, np.int64)

    a_src = np.repeat(np.arange(a.n_rows, dtype=np.int64), np.diff(a_off))
    # expansion: each A edge (i,k) spawns nnz_B(k) product slots
    per_edge = np.diff(b_off)[a_cols]
    W = int(per_edge.sum())
    if W == 0:
        return SpgemmResult(Csr(a.n_rows, b.n_cols,
                                np.zeros(a.n_rows + 1, np.int32),
                                np.empty(0, np.int32), np.empty(0, np.float32)),
                            0.0)
    a_eid = np.repeat(np.arange(a.nnz, dtype=np.int64), per_edge)
    k_in_b = np.arange(W) - np.repeat(np.cumsum(per_edge) - per_edge, per_edge)
    b_eid = b_off[a_cols[a_eid]] + k_in_b

    args = (jnp.asarray(a_src[a_eid].astype(np.int32)),
            jnp.asarray(b_cols[b_eid].astype(np.int32)),
            jnp.asarray(np.asarray(a.values, np.float32)[a_eid]),
            jnp.asarray(np.asarray(b.values, np.float32)[b_eid]))
    if warmup:
        from essentials_tpu.utils.timer import fence
        fence(_numeric_kernel(*args, W))
    t = Timer().begin()
    ur, uc, vals, nnz = _numeric_kernel(*args, W)
    ms = t.end(sync=vals)

    nnz = int(nnz)
    rows = np.asarray(ur)[:nnz].astype(np.int64)
    cols = np.asarray(uc)[:nnz].astype(np.int32)
    vals = np.asarray(vals)[:nnz]
    deg = np.bincount(rows, minlength=a.n_rows)
    off = np.zeros(a.n_rows + 1, np.int64)
    np.cumsum(deg, out=off[1:])
    return SpgemmResult(Csr(a.n_rows, b.n_cols, off.astype(np.int32),
                            cols, vals.astype(np.float32)), ms)


def cpu_reference(a: Csr, b: Csr) -> Csr:
    """Host Gustavson via dict accumulation."""
    from collections import defaultdict
    a_off = np.asarray(a.row_offsets)
    a_cols = np.asarray(a.col_indices)
    a_vals = np.asarray(a.values, np.float64)
    b_off = np.asarray(b.row_offsets)
    b_cols = np.asarray(b.col_indices)
    b_vals = np.asarray(b.values, np.float64)
    rows, cols, vals = [], [], []
    for i in range(a.n_rows):
        acc = defaultdict(float)
        for e in range(a_off[i], a_off[i + 1]):
            k, av = a_cols[e], a_vals[e]
            for f in range(b_off[k], b_off[k + 1]):
                acc[int(b_cols[f])] += av * b_vals[f]
        for j in sorted(acc):
            rows.append(i)
            cols.append(j)
            vals.append(acc[j])
    from essentials_tpu.formats.coo import Coo
    return Csr.from_coo(Coo(a.n_rows, b.n_cols,
                            np.array(rows, np.int32), np.array(cols, np.int32),
                            np.array(vals, np.float32)))
