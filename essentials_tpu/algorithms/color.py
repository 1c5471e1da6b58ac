"""Graph coloring (Jones-Plassmann independent sets, multi-wave).

Reference parity: gunrock::color (/root/reference/include/gunrock/algorithms/
color.hxx:63-141): random vertex priorities; per iteration each uncolored
vertex that is the max (resp. min) priority among its uncolored neighbors
takes color 2*it (resp. 2*it+1). The frontier is the uncolored vertex set.

TPU-native upgrades over the reference:

* m WAVES per sweep: m independent random priority permutations are
  evaluated against ONE expansion of the uncolored mask — round count
  divides by ~m (measured exactly m-fold on rmat graphs) while the per-round
  cost grows only by the per-wave combine, because the per-edge priorities
  are STATIC (expanded + routed once at init) and the 2m boundary combines
  share one backward route (ops/segment.py:combine_minmax_multi).
* budget spray path for the shrinking uncolored tail (degree-skew
  tolerant: gate is sum-of-degrees, not max degree).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from essentials_tpu.frontier import full_frontier
from essentials_tpu.framework.enactor import enact, default_converged, EnactResult
from essentials_tpu.graph.graph import Graph
from essentials_tpu.ops import Combine
from essentials_tpu.ops.sparse_advance import (
    spray_enabled, compact_frontier, frontier_out_degree, spray_candidates,
    SPRAY_BUDGET, SPRAY_K)

# independent priority waves per sweep (round count divides by ~WAVES;
# each extra wave costs one fused minmax scan + two shared-route payloads)
WAVES = 8
IMAX = np.iinfo(np.int32).max


class ColorState(NamedTuple):
    """The uncolored set only SHRINKS, so once it fits the index list the
    sparse path keeps it current by filtering (no O(V) recompaction)."""
    colors: jax.Array       # int32[Vp], -1 = uncolored
    pris: jax.Array         # int32[WAVES, Vp] random priority permutations
    pri_csc: tuple          # WAVES x int32[Ep]: pris[j][src(e)], CSC order
    frontier: jax.Array     # bool[Vp] uncolored vertices
    fidx: jax.Array         # int32[K]
    fcount: jax.Array       # int32
    fvalid: jax.Array       # bool


class ColorResult(NamedTuple):
    colors: jax.Array
    iterations: int
    elapsed_ms: float


def _expand_pris_to_csc(g: Graph, pris):
    """Static per-edge priorities pris[j][src(e)] in CSC order."""
    from essentials_tpu.ops.segment import (expand_multi_then_route,
                                            expand_vertex_to_edges,
                                            apply_permutation)
    ep = g.n_edges_padded
    vals = tuple(pris[j] for j in range(pris.shape[0]))
    if g.off_route_csr is not None and g.route_fwd is not None:
        from essentials_tpu.ops.cube_router import chainable
        if chainable(g.off_route_csr.plan, g.route_fwd):
            return expand_multi_then_route(vals, g.off_route_csr,
                                           g.route_fwd, n_valid=ep)
    out = []
    for v in vals:
        e = expand_vertex_to_edges(v, g.row_offsets, ep)
        out.append(apply_permutation(g.csc_rank, e))
    return tuple(out)


def init(g: Graph, seed: int = 0) -> ColorState:
    vp = g.n_vertices_padded
    keys = jax.random.split(jax.random.PRNGKey(seed), WAVES)
    pris = jnp.stack([jax.random.permutation(k, vp).astype(jnp.int32)
                      for k in keys])
    pri_csc = _expand_pris_to_csc(g, pris)
    colors = jnp.full(vp, -1, jnp.int32)
    return ColorState(colors, pris, pri_csc, full_frontier(g),
                      jnp.full(SPRAY_K, g.pad_vertex, jnp.int32),
                      jnp.int32(g.n_vertices), jnp.asarray(False))


def _finish(state: ColorState, it, minmax_per_wave):
    """Assign colors for every wave's (max, min) sweeps; wave j of round it
    uses colors 2*(it*WAVES+j) and 2*(it*WAVES+j)+1."""
    colors, pris, frontier = state.colors, state.pris, state.frontier
    nc = colors
    newly = jnp.zeros_like(frontier)
    for j, (nbr_max, nbr_min) in enumerate(minmax_per_wave):
        p = pris[j]
        is_max = frontier & ~newly & (p > nbr_max)
        is_min = frontier & ~newly & (p < nbr_min) & ~is_max
        base = 2 * (it * WAVES + j)
        nc = jnp.where(is_max, base, nc)
        nc = jnp.where(is_min, base + 1, nc)
        newly = newly | is_max | is_min
    return nc, frontier & ~newly


def _dense_sweep(g: Graph, state: ColorState):
    """ONE uncolored-mask expansion feeds all 2*WAVES combines (the
    per-edge priorities are static)."""
    from essentials_tpu.ops.advance import _expand_and_route
    from essentials_tpu.ops.configs import AdvanceIO
    active, _ = _expand_and_route(g, state.frontier, AdvanceIO.VERTICES, ())
    if g.off_route_csc is not None:
        from essentials_tpu.ops.segment import combine_minmax_multi
        return combine_minmax_multi(list(state.pri_csc), active,
                                    g.off_route_csc, g.csc_seg_flags)
    # non-routed fallback (CPU tests): per-wave masked combines
    from essentials_tpu.ops.segment import combine_by_offsets
    outs = []
    for pe in state.pri_csc:
        mx = combine_by_offsets(
            jnp.where(active, pe, -IMAX - 1), g.csc_offsets, Combine.MAX,
            g.csc_seg_flags)
        mn = combine_by_offsets(
            jnp.where(active, pe, IMAX), g.csc_offsets, Combine.MIN,
            g.csc_seg_flags)
        outs.append((mx, mn))
    return outs


def step(g: Graph, state: ColorState, it) -> ColorState:
    colors, pris, pri_csc, frontier, fidx, fcount, fvalid = state
    K = SPRAY_K
    vp = g.n_vertices_padded

    if not spray_enabled(g):
        nc, nf = _finish(state, it, _dense_sweep(g, state))
        return ColorState(nc, pris, pri_csc, nf, fidx, fcount, fvalid)

    offs, deg = jax.lax.cond(
        fvalid, lambda _: frontier_out_degree(g, fidx),
        lambda _: (jnp.zeros(K, jnp.int32), jnp.zeros(K, jnp.int32)), None)
    take_spray = fvalid & (jnp.sum(deg) <= SPRAY_BUDGET)

    def sparse(_):
        # budgeted spray: enumerate exactly the uncolored set's out-edges;
        # per-wave priorities expand by the per-segment-constant trick
        _, nb, _, valid = spray_candidates(g, fidx, offs, deg, SPRAY_BUDGET)
        pfx = jnp.cumsum(deg) - deg
        outs = []
        for j in range(WAVES):
            pri_seg = jnp.where(fidx == g.pad_vertex, 0, pris[j][fidx])
            d = jnp.diff(pri_seg, prepend=jnp.zeros(1, jnp.int32))
            z = jnp.zeros(SPRAY_BUDGET, jnp.int32).at[pfx].add(d, mode="drop")
            pri_e = jnp.cumsum(z)
            nbr_max = jnp.full(vp, -IMAX - 1, jnp.int32).at[nb].max(
                jnp.where(valid, pri_e, -IMAX - 1), mode="drop")
            nbr_min = jnp.full(vp, IMAX, jnp.int32).at[nb].min(
                jnp.where(valid, pri_e, IMAX), mode="drop")
            outs.append((nbr_max, nbr_min))
        return tuple(outs)

    minmax = jax.lax.cond(take_spray, sparse,
                          lambda _: tuple(_dense_sweep(g, state)), None)
    nc, nf = _finish(state, it, minmax)

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
    return ColorState(nc, pris, pri_csc, nf, fi2, cnt, cnt <= K)


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
