"""Distributed supersteps: shard_map + XLA collectives over the mesh.

The per-superstep recipe (BASELINE.json north star):
  1. all_gather the [Vs]-sharded frontier/value vector over the mesh axis
     (ICI) -> full [Vtot] replica per device;
  2. local gather-free expansion of the gathered vector along the device's
     global-src-sorted edge block (telescoping cumsum — same engine as
     single-chip, ops/segment.py);
  3. per-device Beneš route into local-dst order + offset-based combine;
  4. psum scalar for convergence.
Everything lives inside one jitted shard_map while_loop: no host round-trips.

Distributed BFS and PageRank are the reference patterns; any advance-based
algorithm ports by swapping the expansion/combine pair.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from essentials_tpu.ops.configs import Combine
from essentials_tpu.ops.segment import expand_vertex_to_edges, combine_by_offsets
from essentials_tpu.ops.permute import apply_plan
from essentials_tpu.parallel.partition import DistGraph

AXIS = "v"


def _local(tree):
    return jax.tree_util.tree_map(lambda a: a[0], tree)


def _spread_local(x_full, soff, route, doff, es, weight=None, use_pallas=False):
    """Common local step: expand gathered [Vtot] values along the local
    src-sorted edge axis, optionally scale by edge weight, route to local
    dst order. Returns dst-ordered per-edge values [Es]."""
    fe = expand_vertex_to_edges(x_full, soff, es)
    if weight is not None:
        fe = fe * weight
    return apply_plan(fe, route, use_pallas=use_pallas)


def dist_bfs(dg: DistGraph, mesh: Mesh, source: int, *,
             max_iterations: int | None = None):
    """Multi-device BFS. Returns global distances [Vtot] (UNREACHED=int32max)."""
    unreached = jnp.iinfo(jnp.int32).max
    vtot = dg.n_vertices_global
    vs = dg.block_size
    es = dg.edges_per_device
    max_it = max_iterations or dg.n_vertices + 1
    use_pallas = jax.default_backend() == "tpu"

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS),
                       P(AXIS, None), P(AXIS), P(AXIS)),
             out_specs=P(AXIS), check_vma=False)
    def run(soff, doff, route, vvalid, dist0, frontier0):
        soff, doff, vvalid = soff[0], doff[0], vvalid[0]
        route_l = _local(route)

        def cond(carry):
            dist, frontier, it = carry
            total = jax.lax.psum(jnp.any(frontier).astype(jnp.int32), AXIS)
            return jnp.logical_and(it < max_it,
                                   jnp.logical_or(it == 0, total > 0))

        def body(carry):
            dist, frontier, it = carry
            f_full = jax.lax.all_gather(frontier, AXIS, tiled=True)  # [Vtot]
            fe = _spread_local(f_full.astype(jnp.int8), soff, route_l, doff,
                               es, use_pallas=use_pallas)
            reached = combine_by_offsets(fe != 0, doff, Combine.OR)[:vs]
            newly = reached & (dist == unreached) & vvalid
            dist = jnp.where(newly, it + 1, dist)
            return dist, newly, it + 1

        dist, _, _ = jax.lax.while_loop(cond, body, (dist0, frontier0, 0))
        return dist

    dist0 = jnp.full(vtot, unreached, jnp.int32).at[source].set(0)
    frontier0 = jnp.zeros(vtot, jnp.bool_).at[source].set(True)
    return run(dg.src_offsets, dg.dst_offsets, dg.route, dg.vertex_valid,
               dist0, frontier0)


def dist_sssp(dg: DistGraph, mesh: Mesh, source: int, *,
              max_iterations: int | None = None):
    """Multi-device SSSP (Bellman-Ford frontier relaxation): per superstep,
    all_gather the sharded distance vector, relax every local edge
    (dist[src] + w), MIN-combine per owned destination; converge when no
    distance improved anywhere (psum'd flag). Returns distances [Vtot]
    (unreached = +inf)."""
    vtot = dg.n_vertices_global
    vs = dg.block_size
    es = dg.edges_per_device
    max_it = max_iterations or dg.n_vertices + 1
    use_pallas = jax.default_backend() == "tpu"

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS),
                       P(AXIS, None), P(AXIS)),
             out_specs=P(AXIS), check_vma=False)
    def run(soff, doff, route, w, vvalid, dist0):
        soff, doff, vvalid = soff[0], doff[0], vvalid[0]
        route_l = _local(route)
        # static per-device data: route the weights to dst order once
        we = apply_plan(w[0], route_l, use_pallas=use_pallas)

        def cond(carry):
            dist, improved, it = carry
            total = jax.lax.psum(improved.astype(jnp.int32), AXIS)
            return jnp.logical_and(it < max_it,
                                   jnp.logical_or(it == 0, total > 0))

        def body(carry):
            dist, _, it = carry
            d_full = jax.lax.all_gather(dist, AXIS, tiled=True)  # [Vtot]
            de = _spread_local(d_full, soff, route_l, doff, es,
                               use_pallas=use_pallas)
            cand = combine_by_offsets(
                jnp.where(jnp.isfinite(de), de + we, jnp.inf), doff,
                Combine.MIN,
                seg_flags=_dst_seg_flags(doff, es))[:vs]
            better = vvalid & (cand < dist)
            dist = jnp.where(better, cand, dist)
            return dist, jnp.any(better), it + 1

        dist, _, _ = jax.lax.while_loop(
            cond, body, (dist0, jnp.asarray(False), 0))
        return dist

    dist0 = jnp.full(vtot, jnp.inf, jnp.float32).at[source].set(0.0)
    return run(dg.src_offsets, dg.dst_offsets, dg.route, dg.weights,
               dg.vertex_valid, dist0)


def _dst_seg_flags(doff, es):
    """Static segment-start flags over the local dst-sorted edge axis."""
    flags = jnp.zeros(es, jnp.bool_)
    starts = jnp.clip(doff[:-1], 0, es - 1)
    nonempty = doff[1:] > doff[:-1]
    return flags.at[starts].max(nonempty)


def dist_pagerank(dg: DistGraph, mesh: Mesh, *, alpha: float = 0.85,
                  tol: float = 1e-6, max_iterations: int = 100):
    """Multi-device PageRank (unweighted spread). Returns ranks [Vtot]."""
    vtot = dg.n_vertices_global
    vs = dg.block_size
    es = dg.edges_per_device
    nv = dg.n_vertices
    use_pallas = jax.default_backend() == "tpu"

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS),
                       P(AXIS, None), P(AXIS, None), P(AXIS)),
             out_specs=P(AXIS), check_vma=False)
    def run(soff, doff, route, vvalid, odeg, p0):
        soff, doff, vvalid, odeg = soff[0], doff[0], vvalid[0], odeg[0]
        route_l = _local(route)
        odeg_full = jax.lax.all_gather(odeg, AXIS, tiled=True)

        def cond(carry):
            p, err, it = carry
            return jnp.logical_and(it < max_iterations, err > tol)

        def body(carry):
            p, _, it = carry
            p_full = jax.lax.all_gather(p, AXIS, tiled=True)
            contrib_full = jnp.where(odeg_full > 0, p_full / odeg_full, 0.0)
            msg = _spread_local(contrib_full, soff, route_l, doff, es,
                                use_pallas=use_pallas)
            pulled = combine_by_offsets(msg, doff, Combine.SUM)[:vs]
            dangling_local = jnp.sum(jnp.where(vvalid & (odeg == 0), p, 0.0))
            dangling = jax.lax.psum(dangling_local, AXIS)
            base = (1.0 - alpha) / nv + alpha * dangling / nv
            p_new = jnp.where(vvalid, base + alpha * pulled, 0.0)
            err = jax.lax.psum(jnp.sum(jnp.abs(p_new - p)), AXIS)
            return p_new, err, it + 1

        p, _, _ = jax.lax.while_loop(cond, body, (p0, jnp.inf, 0))
        return p

    p0 = jnp.where(jnp.arange(vtot) < nv, 1.0 / nv, 0.0).astype(jnp.float32)
    return run(dg.src_offsets, dg.dst_offsets, dg.route, dg.vertex_valid,
               dg.out_degrees, p0)
