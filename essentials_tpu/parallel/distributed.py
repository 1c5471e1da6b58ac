"""Distributed supersteps: shard_map + XLA collectives over the mesh.

The per-superstep recipe (BASELINE.json north star):
  1. all_gather the [Vs]-sharded frontier/value vector over the mesh axis
     (ICI) -> full [P*Vs] replica per device;
  2. local gather along the device's own edge block + message compute;
  3. local sorted segment-combine keyed by locally-owned destinations;
  4. psum scalar for convergence.
Everything lives inside one jitted shard_map while_loop: no host round-trips.

Distributed BFS and PageRank are provided as reference patterns; any
algorithm written against `essentials_tpu.ops.advance` ports by swapping the
gather/combine pair.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from essentials_tpu.parallel.partition import DistGraph

AXIS = "v"


def _specs(mesh: Mesh):
    shard = P(AXIS)
    return shard


def dist_bfs(dg: DistGraph, mesh: Mesh, source: int, *,
             max_iterations: int | None = None):
    """Multi-device BFS. Returns global distances [P*Vs] (UNREACHED=int32 max)."""
    unreached = jnp.iinfo(jnp.int32).max
    vtot = dg.n_vertices_global
    max_it = max_iterations or dg.n_vertices + 1

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None),
                       P(AXIS, None), P(AXIS), P(AXIS)),
             out_specs=P(AXIS))
    def run(src, dstl, evalid, vvalid, dist0, frontier0):
        src, dstl, evalid, vvalid = (a[0] for a in (src, dstl, evalid, vvalid))

        def cond(carry):
            dist, frontier, it = carry
            any_local = jnp.any(frontier)
            total = jax.lax.psum(any_local.astype(jnp.int32), AXIS)
            return jnp.logical_and(it < max_it,
                                   jnp.logical_or(it == 0, total > 0))

        def body(carry):
            dist, frontier, it = carry
            # 1. exchange: full frontier replica over ICI
            f_full = jax.lax.all_gather(frontier, AXIS, tiled=True)  # [Vtot]
            # 2. local gather over owned edge block
            active = (f_full[src] & evalid).astype(jnp.int8)
            # 3. local combine: any active in-edge -> reached
            reached = jnp.zeros(dist.shape, jnp.int8).at[dstl].max(active) > 0
            newly = reached & (dist == unreached) & vvalid
            dist = jnp.where(newly, it + 1, dist)
            return dist, newly, it + 1

        dist, _, _ = jax.lax.while_loop(cond, body, (dist0, frontier0, 0))
        return dist

    dist0 = jnp.full(vtot, unreached, jnp.int32).at[source].set(0)
    frontier0 = jnp.zeros(vtot, jnp.bool_).at[source].set(True)
    return run(dg.src, dg.dst_local, dg.edge_valid, dg.vertex_valid,
               dist0, frontier0)


def dist_pagerank(dg: DistGraph, mesh: Mesh, *, alpha: float = 0.85,
                  tol: float = 1e-6, max_iterations: int = 100):
    """Multi-device PageRank. Returns ranks [P*Vs] (pad slots 0)."""
    vtot = dg.n_vertices_global
    nv = dg.n_vertices

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None),
                       P(AXIS, None), P(AXIS, None), P(AXIS)),
             out_specs=P(AXIS))
    def run(src, dstl, evalid, vvalid, odeg, p0):
        src, dstl, evalid, vvalid, odeg = (
            a[0] for a in (src, dstl, evalid, vvalid, odeg))
        odeg_full = jax.lax.all_gather(odeg, AXIS, tiled=True)

        def cond(carry):
            p, err, it = carry
            return jnp.logical_and(it < max_iterations, err > tol)

        def body(carry):
            p, _, it = carry
            p_full = jax.lax.all_gather(p, AXIS, tiled=True)
            contrib_full = jnp.where(odeg_full > 0, p_full / odeg_full, 0.0)
            msg = jnp.where(evalid, contrib_full[src], 0.0)
            pulled = jax.ops.segment_sum(msg, dstl, num_segments=p.shape[0],
                                         indices_are_sorted=True)
            # dangling mass: global sum of ranks at sink vertices
            dangling_local = jnp.sum(jnp.where(vvalid & (odeg == 0), p, 0.0))
            dangling = jax.lax.psum(dangling_local, AXIS)
            base = (1.0 - alpha) / nv + alpha * dangling / nv
            p_new = jnp.where(vvalid, base + alpha * pulled, 0.0)
            err = jax.lax.psum(jnp.sum(jnp.abs(p_new - p)), AXIS)
            return p_new, err, it + 1

        p, _, _ = jax.lax.while_loop(cond, body, (p0, jnp.inf, 0))
        return p

    p0 = jnp.where(
        jnp.arange(vtot) < nv, 1.0 / nv, 0.0).astype(jnp.float32)
    return run(dg.src, dg.dst_local, dg.edge_valid, dg.vertex_valid,
               dg.out_degrees, p0)
