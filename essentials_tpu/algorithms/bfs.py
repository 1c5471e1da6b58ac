"""Breadth-first search.

Reference parity: gunrock::bfs (/root/reference/include/gunrock/algorithms/
bfs.hxx:110-178): frontier-driven level-synchronous BFS. TPU-native
structure: the hot loop computes ONLY the reached-set per level (an
OR-combine — one int32 cumsum over the edge axis); depths are assigned from
the iteration counter; predecessors are derived afterwards in a single
full-graph advance (MIN over sources one level up) instead of the
reference's per-step atomic races — deterministic smallest-id predecessors.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from essentials_tpu.frontier import frontier_from_indices
from essentials_tpu.framework.enactor import enact, default_converged, EnactResult
from essentials_tpu.graph.graph import Graph
from essentials_tpu.ops import advance, Combine, AdvanceIO
from essentials_tpu.ops.sparse_advance import (
    sparse_enabled, compact_frontier, next_frontier_idx, _neighborhoods_idx,
    frontier_idx_ok, k_for)

UNREACHED = np.iinfo(np.int32).max


class BfsState(NamedTuple):
    """Hybrid frontier: the boolmap is always maintained; when the frontier
    fits in ``fidx`` (<= K entries, fvalid) the sparse path runs O(K*dmax)
    work per level and regenerates the index list from its own candidates
    (never an O(V) compaction)."""
    distances: jax.Array      # int32[Vp], UNREACHED where not found yet
    frontier: jax.Array       # bool[Vp]
    fidx: jax.Array           # int32[K] frontier indices (pad_vertex-filled)
    fcount: jax.Array         # int32: |frontier|
    fvalid: jax.Array         # bool: fidx is in sync with frontier


class BfsResult(NamedTuple):
    distances: jax.Array
    predecessors: jax.Array
    iterations: int
    elapsed_ms: float


def init(g: Graph, source: int | jax.Array) -> BfsState:
    vp = g.n_vertices_padded
    dist = jnp.full(vp, UNREACHED, jnp.int32).at[source].set(0)
    frontier = frontier_from_indices(g, jnp.asarray([source]))
    fidx = jnp.full(k_for(g), g.pad_vertex, jnp.int32).at[0].set(source)
    return BfsState(dist, frontier, fidx, jnp.int32(1),
                    frontier_idx_ok(g, fidx, jnp.int32(1)))


def step(g: Graph, state: BfsState, it) -> BfsState:
    """One level. Work-adaptive lax.cond: frontiers whose index list is
    current AND whose members' degrees fit the candidate matrix run the
    sparse O(|f|*dmax) gather path; everything else runs the dense O(E)
    segment engine (which also compacts the next index list, so skewed
    graphs still go sparse for their low-degree tail levels)."""
    dist, frontier, fidx, fcount, fvalid = state
    K = k_for(g)
    vp = g.n_vertices_padded

    def dense_reach(f):
        return advance(g, lambda e: True, f,
                       combine=Combine.OR, with_frontier=False)

    if not sparse_enabled(g):
        newly = dense_reach(frontier) & (dist == UNREACHED)
        return BfsState(jnp.where(newly, it + 1, dist), newly, fidx,
                        jnp.int32(0), jnp.asarray(False))

    def sparse(_):
        _, nb, valid = _neighborhoods_idx(g, fidx)
        out = jnp.zeros(vp, jnp.int8).at[nb].max(valid.astype(jnp.int8),
                                                 mode="drop")
        newly = (out > 0) & (dist == UNREACHED)
        keep = valid & newly[nb]
        nidx, ncount = next_frontier_idx(nb, keep, K, g.pad_vertex)
        return newly, nidx, ncount

    def dense(_):
        newly = dense_reach(frontier) & (dist == UNREACHED)
        fc = jnp.count_nonzero(newly)
        # compact only when the next frontier fits (transition rounds);
        # big-frontier rounds skip the O(V) sort
        nidx = jax.lax.cond(
            fc <= K, lambda m: compact_frontier(m, K, g.pad_vertex),
            lambda m: jnp.full(K, g.pad_vertex, jnp.int32), newly)
        return newly, nidx, fc

    newly, fi, fc = jax.lax.cond(fvalid, sparse, dense, None)
    fv = (fc <= K) & frontier_idx_ok(g, fi, fc)
    return BfsState(jnp.where(newly, it + 1, dist), newly, fi, fc, fv)


def predecessors_from_distances(g: Graph, dist: jax.Array) -> jax.Array:
    """pred[v] = smallest-id in-neighbor one BFS level up (-1 at source /
    unreached). One full-graph advance (MIN)."""
    def msg(e):
        ok = (e.src_vals[0] + 1) == e.dst_vals[0]
        return jnp.where(ok, e.src, jnp.iinfo(jnp.int32).max)

    cand = advance(g, msg, None, src_values=(dist,), dst_values=(dist,),
                   input_kind=AdvanceIO.GRAPH, combine=Combine.MIN,
                   with_frontier=False)
    valid = (dist != UNREACHED) & (dist > 0) & (cand < jnp.iinfo(jnp.int32).max)
    return jnp.where(valid, cand, -1)


def run(g: Graph, source: int, *, max_iterations: int | None = None,
        compute_predecessors: bool = True, warmup: bool = True) -> BfsResult:
    max_it = max_iterations if max_iterations is not None else g.n_vertices + 1
    res: EnactResult = enact(step, default_converged, g, init(g, source),
                             max_iterations=max_it, warmup=warmup)
    st: BfsState = res.state
    v = g.n_vertices
    if compute_predecessors:
        pred = predecessors_from_distances(g, st.distances)[:v]
    else:
        pred = jnp.full(v, -1, jnp.int32)
    return BfsResult(st.distances[:v], pred, res.iterations, res.elapsed_ms)


def cpu_reference(csr, source: int) -> np.ndarray:
    """Host BFS (reference parity: examples/algorithms/bfs/bfs_cpu.hxx)."""
    n = csr.n_rows
    dist = np.full(n, UNREACHED, np.int32)
    dist[source] = 0
    frontier = [source]
    level = 0
    offsets, cols = np.asarray(csr.row_offsets), np.asarray(csr.col_indices)
    while frontier:
        level += 1
        nxt = []
        for u in frontier:
            for e in range(offsets[u], offsets[u + 1]):
                vtx = cols[e]
                if dist[vtx] == UNREACHED:
                    dist[vtx] = level
                    nxt.append(vtx)
        frontier = nxt
    return dist
