"""Graph coloring (Luby/Jones-Plassmann independent sets, 2 colors/iter).

Reference parity: gunrock::color (/root/reference/include/gunrock/algorithms/
color.hxx:63-141): random vertex priorities; per iteration each uncolored
vertex that is the max (resp. min) priority among its uncolored neighbors
takes color 2*it (resp. 2*it+1). The frontier is the uncolored vertex set.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from essentials_tpu.frontier import full_frontier
from essentials_tpu.framework.enactor import enact, default_converged, EnactResult
from essentials_tpu.graph.graph import Graph
from essentials_tpu.ops import advance, Combine
from essentials_tpu.ops.sparse_advance import (
    sparse_enabled, compact_frontier, _neighborhoods_idx, frontier_idx_ok,
    k_for)


class ColorState(NamedTuple):
    """The uncolored set only SHRINKS, so once it fits the index list the
    sparse path keeps it current by filtering (no O(V) recompaction)."""
    colors: jax.Array       # int32[Vp], -1 = uncolored
    randoms: jax.Array      # float32[Vp] random priorities
    frontier: jax.Array     # bool[Vp] uncolored vertices
    fidx: jax.Array         # int32[K]
    fcount: jax.Array       # int32
    fvalid: jax.Array       # bool


class ColorResult(NamedTuple):
    colors: jax.Array
    iterations: int
    elapsed_ms: float


def init(g: Graph, seed: int = 0) -> ColorState:
    vp = g.n_vertices_padded
    key = jax.random.PRNGKey(seed)
    # strictly tie-free priorities: random permutation rank per vertex
    randoms = jax.random.permutation(key, vp).astype(jnp.float32)
    colors = jnp.full(vp, -1, jnp.int32)
    return ColorState(colors, randoms, full_frontier(g),
                      jnp.full(k_for(g), g.pad_vertex, jnp.int32),
                      jnp.int32(g.n_vertices), jnp.asarray(False))


def step(g: Graph, state: ColorState, it) -> ColorState:
    colors, randoms, frontier, fidx, fcount, fvalid = state
    K = k_for(g)
    vp = g.n_vertices_padded

    def dense_sweep(f):
        # max / min priority among *uncolored* neighbors of each vertex;
        # ONE expansion + routing feeds both combines (advance_multi).
        from essentials_tpu.ops import advance_multi
        return advance_multi(
            g,
            [(lambda e: e.src_vals[0], Combine.MAX),
             (lambda e: e.src_vals[0], Combine.MIN)],
            f, src_values=(randoms,))

    def finish(nbr_max, nbr_min):
        is_max = frontier & (randoms > nbr_max)
        is_min = frontier & (randoms < nbr_min) & ~is_max
        nc = jnp.where(is_max, 2 * it, colors)
        nc = jnp.where(is_min, 2 * it + 1, nc)
        nf = frontier & ~(is_max | is_min)
        return nc, nf

    if not sparse_enabled(g):
        nc, nf = finish(*dense_sweep(frontier))
        return ColorState(nc, randoms, nf, fidx, fcount, fvalid)

    def sparse(_):
        _, nb, valid = _neighborhoods_idx(g, fidx)
        pri = randoms[fidx][:, None]
        ninf = jnp.float32(-1.0)
        nbr_max = jnp.full(vp, ninf, jnp.float32).at[nb].max(
            jnp.where(valid, pri, ninf), mode="drop")
        big = jnp.float32(vp + 1)
        nbr_min = jnp.full(vp, big, jnp.float32).at[nb].min(
            jnp.where(valid, pri, big), mode="drop")
        return nbr_max, nbr_min

    nbr_max, nbr_min = jax.lax.cond(fvalid, sparse,
                                    lambda _: dense_sweep(frontier), None)
    nc, nf = finish(nbr_max, nbr_min)

    def next_idx_sparse(_):
        # the uncolored set shrinks: filter the carried index list (O(K))
        keep = nf[fidx] & (fidx != g.pad_vertex)
        fi2 = jnp.sort(jnp.where(keep, fidx, jnp.int32(2**30)))
        return jnp.where(fi2 < 2**30, fi2, g.pad_vertex), jnp.sum(keep)

    def next_idx_dense(_):
        cnt = jnp.count_nonzero(nf)
        fi2 = jax.lax.cond(
            cnt <= K, lambda m: compact_frontier(m, K, g.pad_vertex),
            lambda m: jnp.full(K, g.pad_vertex, jnp.int32), nf)
        return fi2, cnt

    fi2, cnt = jax.lax.cond(fvalid, next_idx_sparse, next_idx_dense, None)
    fv = (cnt <= K) & frontier_idx_ok(g, fi2, cnt)
    return ColorState(nc, randoms, nf, fi2, cnt, fv)


def run(g: Graph, *, seed: int = 0, max_iterations: int | None = None,
        warmup: bool = True) -> ColorResult:
    max_it = max_iterations if max_iterations is not None else g.n_vertices + 1
    res: EnactResult = enact(step, default_converged, g, init(g, seed),
                             max_iterations=max_it, warmup=warmup)
    return ColorResult(res.state.colors[:g.n_vertices], res.iterations,
                       res.elapsed_ms)


def validate(csr, colors: np.ndarray) -> int:
    """Count conflicting edges (endpoints sharing a color) + uncolored
    vertices (reference parity: examples/algorithms/color validation)."""
    colors = np.asarray(colors)
    off = np.asarray(csr.row_offsets)
    cols = np.asarray(csr.col_indices)
    src = np.repeat(np.arange(csr.n_rows), np.diff(off))
    conflicts = int(np.sum((colors[src] == colors[cols]) & (src != cols)))
    return conflicts + int(np.sum(colors < 0))
