"""Parallel operators — the heart of the framework.

Capability parity with reference include/gunrock/framework/operators/
(advance, filter, parallel_for, uniquify, neighborreduce, batch;
configs.hxx:31-92) re-designed for XLA: every operator is a pure function of
(graph, frontier mask, user closure) -> new arrays, built on gathers plus
*sorted* segment reductions instead of atomics and load-balanced kernels. The
reference's load_balance_t variants (thread_mapped / block_mapped /
merge_path) collapse into one edge-centric formulation whose balance is
inherent: work is laid out along the edge axis, so a degree-10^6 vertex and a
degree-1 vertex cost the same per edge.
"""

from essentials_tpu.ops.configs import Combine, AdvanceIO
from essentials_tpu.ops.advance import (advance, advance_multi,
                                        advance_edges, advance_count,
                                        Edges)
from essentials_tpu.ops.filter import filter_frontier
from essentials_tpu.ops.parallel_for import for_each_vertex, for_each_edge
from essentials_tpu.ops.uniquify import uniquify
from essentials_tpu.ops.neighborreduce import neighbor_reduce
from essentials_tpu.ops.batch import batch_execute
from essentials_tpu.ops.segment import (segment_combine, combine_by_offsets,
                                        expand_vertex_to_edges,
                                        apply_permutation)

__all__ = [
    "Combine", "AdvanceIO", "advance", "advance_multi", "advance_edges",
    "advance_count",
    "Edges", "filter_frontier", "for_each_vertex", "for_each_edge",
    "uniquify", "neighbor_reduce", "batch_execute", "segment_combine",
    "combine_by_offsets", "expand_vertex_to_edges", "apply_permutation",
]
