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
    spray_enabled, compact_frontier, frontier_out_degree, spray_candidates,
    SPRAY_BUDGET, SPRAY_K)


class ColorState(NamedTuple):
    """The uncolored set only SHRINKS, so once it fits the index list the
    sparse path keeps it current by filtering (no O(V) recompaction)."""
    colors: jax.Array       # int32[Vp], -1 = uncolored
    randoms: jax.Array      # int32[Vp] priorities (degree-LF | random rank)
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
    # Largest-degree-first priorities with a tie-free random rank in the
    # low bits: on power-law graphs hubs become local extrema (and get
    # colored) in the first rounds instead of waiting for their whole
    # neighborhoods to drain — far fewer rounds than pure-random
    # (Jones-Plassmann LF; the reference uses pure random, color.hxx:63).
    rank_bits = max(int(np.ceil(np.log2(max(vp, 2)))), 1)
    deg_bits = 31 - rank_bits
    deg = jnp.minimum(g.out_degrees().astype(jnp.int32),
                      (1 << deg_bits) - 1)
    rank = jax.random.permutation(key, vp).astype(jnp.int32)
    randoms = jnp.bitwise_or(jnp.left_shift(deg, rank_bits), rank)
    colors = jnp.full(vp, -1, jnp.int32)
    return ColorState(colors, randoms, full_frontier(g),
                      jnp.full(SPRAY_K, g.pad_vertex, jnp.int32),
                      jnp.int32(g.n_vertices), jnp.asarray(False))


def step(g: Graph, state: ColorState, it) -> ColorState:
    colors, randoms, frontier, fidx, fcount, fvalid = state
    K = SPRAY_K
    vp = g.n_vertices_padded
    imax = jnp.iinfo(jnp.int32).max

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

    if not spray_enabled(g):
        nc, nf = finish(*dense_sweep(frontier))
        return ColorState(nc, randoms, nf, fidx, fcount, fvalid)

    offs, deg = jax.lax.cond(
        fvalid, lambda _: frontier_out_degree(g, fidx),
        lambda _: (jnp.zeros(K, jnp.int32), jnp.zeros(K, jnp.int32)), None)
    take_spray = fvalid & (jnp.sum(deg) <= SPRAY_BUDGET)

    def sparse(_):
        # budgeted spray: enumerate exactly the uncolored set's out-edges
        # (degree-skew tolerant — no per-vertex degree cap)
        _, nb, _, valid = spray_candidates(g, fidx, offs, deg, SPRAY_BUDGET)
        # pri[src] per candidate slot: per-segment-constant expansion
        # (scatter K diffs + cumsum; see spray_candidates' docstring)
        pfx = jnp.cumsum(deg) - deg
        pri_seg = jnp.where(fidx == g.pad_vertex, 0, randoms[fidx])
        d = jnp.diff(pri_seg, prepend=jnp.zeros(1, jnp.int32))
        z = jnp.zeros(SPRAY_BUDGET, jnp.int32).at[pfx].add(d, mode="drop")
        pri_e = jnp.cumsum(z)
        nbr_max = jnp.full(vp, -imax, jnp.int32).at[nb].max(
            jnp.where(valid, pri_e, -imax), mode="drop")
        nbr_min = jnp.full(vp, imax, jnp.int32).at[nb].min(
            jnp.where(valid, pri_e, imax), mode="drop")
        return nbr_max, nbr_min

    nbr_max, nbr_min = jax.lax.cond(
        take_spray, sparse, lambda _: tuple(dense_sweep(frontier)), None)
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
    return ColorState(nc, randoms, nf, fi2, cnt, cnt <= K)


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
