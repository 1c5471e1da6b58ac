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


class ColorState(NamedTuple):
    colors: jax.Array       # int32[Vp], -1 = uncolored
    randoms: jax.Array      # float32[Vp] random priorities
    frontier: jax.Array     # bool[Vp] uncolored vertices


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
    return ColorState(colors, randoms, full_frontier(g))


def step(g: Graph, state: ColorState, it) -> ColorState:
    colors, randoms, frontier = state

    # max / min priority among *uncolored* neighbors of each vertex;
    # ONE expansion + routing feeds both combines (advance_multi).
    from essentials_tpu.ops import advance_multi
    nbr_max, nbr_min = advance_multi(
        g,
        [(lambda e: e.src_vals[0], Combine.MAX),
         (lambda e: e.src_vals[0], Combine.MIN)],
        frontier, src_values=(randoms,))

    is_max = frontier & (randoms > nbr_max)
    is_min = frontier & (randoms < nbr_min) & ~is_max
    colors = jnp.where(is_max, 2 * it, colors)
    colors = jnp.where(is_min, 2 * it + 1, colors)
    return ColorState(colors, randoms, frontier & ~(is_max | is_min))


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
