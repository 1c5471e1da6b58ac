"""Graph partitioning for multi-device execution.

The reference's only multi-device mechanism is VMM memory striping with no
compute distribution (/root/reference/include/gunrock/virtual_memory.hxx;
every operator rejects multi-context, advance.hxx:125-128). Here: a 1-D
destination-owner edge partition designed for the TPU mesh —

* vertices are split into P contiguous blocks of ``block_size`` (the global
  padded vertex count becomes P * block_size);
* each device owns every edge whose *destination* falls in its block — since
  the framework's combine step is always keyed by destination, each device's
  segment reduction is purely local;
* per-superstep communication is one `all_gather` of the [Vs]-sharded
  frontier/value arrays over the mesh axis (rides ICI), after which every
  gather is local. Convergence scalars use `psum`.

Edge blocks are padded to the max per-device edge count so the stacked
arrays are rectangular (static shapes for XLA).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from essentials_tpu import dtypes
from essentials_tpu.formats.csr import Csr
from essentials_tpu.formats.coo import Coo


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@partial(jax.tree_util.register_dataclass,
         data_fields=["src", "dst_local", "weights", "edge_valid",
                      "vertex_valid", "out_degrees"],
         meta_fields=["n_devices", "block_size", "edges_per_device",
                      "n_vertices", "n_edges"])
@dataclass(frozen=True)
class DistGraph:
    """Edge-partitioned graph, stacked per device along axis 0."""
    n_devices: int
    block_size: int            # Vs: vertices owned per device
    edges_per_device: int      # Es: padded edge count per device
    n_vertices: int            # real V
    n_edges: int               # real E

    src: jax.Array             # [P, Es] int32 global source ids (pad -> V)
    dst_local: jax.Array       # [P, Es] int32 local dst in [0, Vs) (pad -> 0)
    weights: jax.Array         # [P, Es] weight (pad -> 0)
    edge_valid: jax.Array      # [P, Es] bool
    vertex_valid: jax.Array    # [P, Vs] bool (real vertices)
    out_degrees: jax.Array     # [P, Vs] int32 (global out-degree of owned verts)

    @property
    def n_vertices_global(self) -> int:
        """Total padded vertex axis = P * Vs."""
        return self.n_devices * self.block_size


def partition_graph(csr: Csr | Coo, n_devices: int, *,
                    vertex_align: int = 8) -> DistGraph:
    """1-D destination-owner partition of a host graph."""
    if isinstance(csr, Coo):
        csr = Csr.from_coo(csr)
    v, e = csr.n_rows, csr.nnz
    vs = _pad_to(max(_pad_to(v, n_devices) // n_devices, 1), vertex_align)
    coo = csr.to_coo()
    owner = (coo.col_indices // vs).astype(np.int64)

    counts = np.bincount(owner, minlength=n_devices)
    es = max(int(counts.max()), 1)

    src = np.full((n_devices, es), v, dtype=dtypes.vertex_dtype)
    dstl = np.zeros((n_devices, es), dtype=dtypes.vertex_dtype)
    w = np.zeros((n_devices, es), dtype=coo.values.dtype)
    valid = np.zeros((n_devices, es), dtype=bool)

    # Sort edges by (owner, dst, src) so per-device segments are sorted.
    order = np.lexsort((coo.row_indices, coo.col_indices, owner))
    so, sd, sr, sv = (owner[order], coo.col_indices[order],
                      coo.row_indices[order], coo.values[order])
    starts = np.zeros(n_devices + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    for p in range(n_devices):
        k = counts[p]
        sl = slice(starts[p], starts[p] + k)
        src[p, :k] = sr[sl]
        dstl[p, :k] = sd[sl] - p * vs
        w[p, :k] = sv[sl]
        valid[p, :k] = True

    vidx = np.arange(n_devices * vs).reshape(n_devices, vs)
    vertex_valid = vidx < v
    deg = np.zeros(n_devices * vs, dtype=dtypes.edge_dtype)
    deg[:v] = np.diff(csr.row_offsets)

    return DistGraph(
        n_devices=n_devices, block_size=vs, edges_per_device=es,
        n_vertices=v, n_edges=e,
        src=jnp.asarray(src), dst_local=jnp.asarray(dstl),
        weights=jnp.asarray(w), edge_valid=jnp.asarray(valid),
        vertex_valid=jnp.asarray(vertex_valid),
        out_degrees=jnp.asarray(deg.reshape(n_devices, vs)),
    )
