"""neighborreduce: per-vertex reduction over incident out-edges.

Reference parity: operators::neighborreduce::execute via mgpu
transform_segreduce (/root/reference/include/gunrock/framework/operators/
neighborreduce/neighborreduce.hxx:55-101). TPU-native: a sorted segment
reduction keyed by source over the CSR-order edge arrays. This is SpMV's
engine: y[s] = reduce_{(s->d,w)} w * x[d].
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from essentials_tpu.graph.graph import Graph
from essentials_tpu.ops.configs import Combine
from essentials_tpu.ops.segment import segment_combine, combine_identity


def neighbor_reduce(g: Graph, edge_op: Callable, *,
                    combine: Combine = Combine.SUM) -> jax.Array:
    """``edge_op(src, dst, edge_ids, weights) -> per-edge values``; returns the
    [Vp] per-source combine (identity at sourceless/pad slots)."""
    eids = jnp.arange(g.n_edges_padded, dtype=jnp.int32)
    vals = edge_op(g.src_indices, g.col_indices, eids, g.values)
    ident = combine_identity(combine, vals.dtype)
    vals = jnp.where(g.edge_mask(), vals, ident)
    return segment_combine(vals, g.src_indices, g.n_vertices_padded, combine,
                           indices_are_sorted=True)
