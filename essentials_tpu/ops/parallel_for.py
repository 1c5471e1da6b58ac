"""parallel_for: apply a function over vertices/edges (optionally masked).

Reference parity: operators::parallel_for::execute
(/root/reference/include/gunrock/framework/operators/for/for.hxx:29-99) over
frontier elements or over all graph vertices/edges/weights. Functionally:
``fn`` maps id vectors to value vectors; a mask selects which results land.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from essentials_tpu.graph.graph import Graph


def for_each_vertex(g: Graph, fn: Callable, *, frontier: jax.Array | None = None,
                    default=None) -> jax.Array:
    """Apply ``fn(v_ids) -> values`` over all (or active) real vertices.

    Returns values with ``default`` (or 0) in masked-out/pad slots.
    """
    ids = jnp.arange(g.n_vertices_padded, dtype=jnp.int32)
    vals = fn(ids)
    mask = g.vertex_mask() if frontier is None else (frontier & g.vertex_mask())
    fill = jnp.zeros_like(vals) if default is None else jnp.full_like(vals, default)
    return jnp.where(mask, vals, fill)


def for_each_edge(g: Graph, fn: Callable, *, frontier: jax.Array | None = None,
                  default=None) -> jax.Array:
    """Apply ``fn(src, dst, edge_ids, weights) -> values`` over (active) edges
    in CSR edge-id order."""
    eids = jnp.arange(g.n_edges_padded, dtype=jnp.int32)
    vals = fn(g.src_indices, g.col_indices, eids, g.values)
    mask = g.edge_mask() if frontier is None else (frontier & g.edge_mask())
    fill = jnp.zeros_like(vals) if default is None else jnp.full_like(vals, default)
    return jnp.where(mask, vals, fill)
