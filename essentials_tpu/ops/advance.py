"""Advance: frontier -> neighbor expansion with deterministic combine.

Reference parity: operators::advance::execute and its load-balance kernels
(/root/reference/include/gunrock/framework/operators/advance/advance.hxx:91-221,
block_mapped.hxx:38-147, merge_path.hxx:89-113). TPU-native formulation:

    For every edge (s -> d, id e, weight w) whose source s is active,
        msg, cond = edge_op(s, d, e, w)
    combined[d] = monoid-combine of msg over incoming active edges
    out_frontier[d] = OR of (cond) over incoming active edges

All work is on the dst-sorted (CSC-order) edge arrays, so the combine is a
*sorted* segment reduction — XLA lowers it to a segmented scan with perfect
load balance along the edge axis, replacing the reference's merge-path /
block-mapped scheduling and all its atomics. Direction optimization
(push/pull) is moot: this single formulation is simultaneously "push"
(semantics: active sources relax out-edges) and "pull" (schedule: each
destination reduces its in-edges).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from essentials_tpu.errors import throw_if
from essentials_tpu.graph.graph import Graph
from essentials_tpu.ops.configs import Combine, AdvanceIO
from essentials_tpu.ops.segment import segment_combine, combine_identity


def _edge_arrays(g: Graph):
    throw_if(not g.has_csc, "advance requires the CSC (dst-sorted) view")
    return g.csc_src_indices, g.csc_dst_indices, g.csc_edge_ids, g.csc_values


def advance(g: Graph,
            edge_op: Callable,
            frontier: jax.Array | None = None,
            *,
            combine: Combine = Combine.MIN,
            input_kind: AdvanceIO = AdvanceIO.VERTICES,
            with_frontier: bool = True):
    """Expand ``frontier`` along out-edges.

    Args:
      g: the graph.
      edge_op: ``(src, dst, edge_id, weight) -> msg`` or ``-> (msg, cond)``;
        receives full [Ep] vectors (dst-sorted order; edge_id is the CSR edge
        id) and must return [Ep] vectors. ``cond`` marks which relaxations
        "fire" (feed the output frontier); when absent, every active edge
        fires.
      frontier: bool[Vp] vertex mask (input_kind=VERTICES), bool[Ep] CSR-order
        edge mask (EDGES), or None (GRAPH: all real edges).
      combine: monoid used to merge messages per destination.
      with_frontier: also return the OR-combined output frontier.

    Returns:
      ``combined`` float/int[Vp] (identity where no active in-edge), and, if
      ``with_frontier``, ``out_frontier`` bool[Vp].
    """
    src, dst, eid, w = _edge_arrays(g)

    if input_kind == AdvanceIO.GRAPH or frontier is None:
        active = jnp.arange(g.n_edges_padded) < g.n_edges \
            if g.n_edges_padded != g.n_edges else jnp.ones_like(src, dtype=bool)
        # pad edges have src == pad_vertex; excluded via the edge-count mask
        active = active & (src < g.n_vertices)
    elif input_kind == AdvanceIO.VERTICES:
        active = frontier[src]      # pad slot frontier[V] is False by invariant
    elif input_kind == AdvanceIO.EDGES:
        active = frontier[eid]      # edge frontier is in CSR edge-id order
    else:
        raise ValueError(input_kind)

    out = edge_op(src, dst, eid, w)
    if isinstance(out, tuple):
        msg, cond = out
    else:
        msg, cond = out, None
    msg = jnp.broadcast_to(jnp.asarray(msg), src.shape)

    ident = combine_identity(combine, msg.dtype)
    msg = jnp.where(active, msg, ident)
    combined = segment_combine(msg, dst, g.n_vertices_padded, combine,
                               indices_are_sorted=True)
    if not with_frontier:
        return combined

    fired = active if cond is None else (active & cond)
    out_frontier = segment_combine(fired, dst, g.n_vertices_padded, Combine.OR,
                                   indices_are_sorted=True)
    out_frontier = out_frontier & g.vertex_mask()
    return combined, out_frontier


def advance_edges(g: Graph,
                  edge_op: Callable,
                  frontier: jax.Array | None = None,
                  *,
                  input_kind: AdvanceIO = AdvanceIO.VERTICES) -> jax.Array:
    """Advance producing an *edge* frontier: bool[Ep] in CSR edge-id order.

    Each active edge for which ``edge_op`` returns True is in the output.
    Used by edge-frontier algorithms (MST) — reference parity with
    frontier_kind_t::edge_frontier.
    """
    src, dst, eid, w = _edge_arrays(g)
    if input_kind == AdvanceIO.GRAPH or frontier is None:
        active = (jnp.arange(g.n_edges_padded) < g.n_edges) & (src < g.n_vertices)
    elif input_kind == AdvanceIO.VERTICES:
        active = frontier[src]
    else:
        active = frontier[eid]
    cond = edge_op(src, dst, eid, w)
    fired = active & cond
    # Scatter back to CSR edge-id order.
    out = jnp.zeros(g.n_edges_padded, dtype=bool).at[eid].set(fired, mode="drop")
    return out & g.edge_mask()
