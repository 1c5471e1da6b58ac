"""Dense boolmap frontier primitives.

A frontier is simply ``bool[Vp]`` (or ``bool[Ep]`` for edge frontiers); the
pad slots are always False. These helpers keep that invariant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from essentials_tpu.graph.graph import Graph


def empty_frontier(g: Graph, kind: str = "vertex") -> jax.Array:
    n = g.n_vertices_padded if kind == "vertex" else g.n_edges_padded
    return jnp.zeros(n, dtype=jnp.bool_)


def full_frontier(g: Graph, kind: str = "vertex") -> jax.Array:
    """All real vertices/edges active (reference: frontier sequence fill)."""
    if kind == "vertex":
        return g.vertex_mask()
    return g.edge_mask()


def frontier_from_indices(g: Graph, indices, kind: str = "vertex") -> jax.Array:
    n = g.n_vertices_padded if kind == "vertex" else g.n_edges_padded
    idx = jnp.asarray(indices)
    return jnp.zeros(n, dtype=jnp.bool_).at[idx].set(True)


def frontier_size(frontier: jax.Array) -> jax.Array:
    """Number of active elements (device scalar — usable inside while_loop)."""
    return jnp.sum(frontier.astype(jnp.int32))


def frontier_is_empty(frontier: jax.Array) -> jax.Array:
    return ~jnp.any(frontier)


def frontier_to_indices(frontier: jax.Array, capacity: int) -> jax.Array:
    """Fixed-capacity active-index list, padded with -1 (host/interop view)."""
    n = frontier.shape[0]
    idx = jnp.nonzero(frontier, size=capacity, fill_value=-1)[0]
    return idx.astype(jnp.int32)
