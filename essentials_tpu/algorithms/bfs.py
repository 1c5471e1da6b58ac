"""Breadth-first search.

Reference parity: gunrock::bfs (/root/reference/include/gunrock/algorithms/
bfs.hxx:110-178): frontier-driven level synchronous BFS; the reference's
atomicMin depth relaxation inside the advance lambda becomes a deterministic
segment-MIN combine, and the predecessor tie-break is deterministic (smallest
source id) instead of atomic-race-order.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from essentials_tpu.frontier import frontier_from_indices
from essentials_tpu.framework.enactor import enact, default_converged, EnactResult
from essentials_tpu.graph.graph import Graph
from essentials_tpu.ops import advance, Combine

UNREACHED = np.iinfo(np.int32).max


class BfsState(NamedTuple):
    distances: jax.Array      # int32[Vp], UNREACHED where not found yet
    predecessors: jax.Array   # int32[Vp], -1 where none
    frontier: jax.Array       # bool[Vp]


class BfsResult(NamedTuple):
    distances: jax.Array
    predecessors: jax.Array
    iterations: int
    elapsed_ms: float


def init(g: Graph, source: int | jax.Array) -> BfsState:
    vp = g.n_vertices_padded
    dist = jnp.full(vp, UNREACHED, jnp.int32).at[source].set(0)
    pred = jnp.full(vp, -1, jnp.int32)
    frontier = frontier_from_indices(g, jnp.asarray([source]))
    return BfsState(dist, pred, frontier)


def step(g: Graph, state: BfsState, it) -> BfsState:
    dist, pred, frontier = state
    # msg = source id; MIN-combine = deterministic smallest-id predecessor.
    cand_pred, reached = advance(g, lambda e: e.src, frontier,
                                 combine=Combine.MIN)
    newly = reached & (dist == UNREACHED)
    dist = jnp.where(newly, it + 1, dist)
    pred = jnp.where(newly, cand_pred, pred)
    return BfsState(dist, pred, newly)


def run(g: Graph, source: int, *, max_iterations: int | None = None,
        warmup: bool = True) -> BfsResult:
    max_it = max_iterations if max_iterations is not None else g.n_vertices + 1
    res: EnactResult = enact(step, default_converged, g, init(g, source),
                             max_iterations=max_it, warmup=warmup)
    st: BfsState = res.state
    v = g.n_vertices
    return BfsResult(st.distances[:v], st.predecessors[:v],
                     res.iterations, res.elapsed_ms)


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
