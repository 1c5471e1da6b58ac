"""Host-level graph analytics.

Reference parity: graph.hxx get_average_degree (:326-333),
get_degree_standard_deviation (:346-356), build_degree_histogram (:371-404).
All computed on device with XLA reductions (no atomics needed).
"""

from __future__ import annotations

import jax.numpy as jnp

from essentials_tpu.graph.graph import Graph


def _real_degrees(g: Graph):
    deg = g.out_degrees()
    return jnp.where(g.vertex_mask(), deg, 0)


def average_degree(g: Graph) -> float:
    return float(jnp.sum(_real_degrees(g)) / g.n_vertices)


def degree_standard_deviation(g: Graph) -> float:
    deg = _real_degrees(g).astype(jnp.float32)
    mean = jnp.sum(deg) / g.n_vertices
    var = jnp.sum(jnp.where(g.vertex_mask(), (deg - mean) ** 2, 0.0)) / g.n_vertices
    return float(jnp.sqrt(var))


def degree_histogram(g: Graph, n_bins: int = 32) -> jnp.ndarray:
    """log2-scale degree histogram (bin k counts vertices with deg in
    [2^(k-1), 2^k)); bin 0 counts degree-0 vertices."""
    deg = _real_degrees(g)
    bins = jnp.where(deg > 0, jnp.floor(jnp.log2(deg.astype(jnp.float32))) + 1, 0)
    bins = jnp.clip(bins.astype(jnp.int32), 0, n_bins - 1)
    weights = g.vertex_mask().astype(jnp.int32)
    return jnp.zeros(n_bins, jnp.int32).at[bins].add(weights)
