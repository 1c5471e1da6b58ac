"""Minimum spanning forest (Borůvka).

Reference parity: gunrock::mst (/root/reference/include/gunrock/algorithms/
mst.hxx:95-260): per round, each supervertex picks its min-weight outgoing
edge (atomicMin + tiebreak there), merges, pointer-jumps. TPU-native: the
whole round is segment-MIN reductions keyed by component id plus a
fixed-depth pointer-jumping loop; mutual hooks are broken by hooking the
larger root under the smaller; weight ties break on a *canonical undirected
edge key* so both endpoints of a tie agree on the same edge (the reference
instead documents its float-atomic nondeterminism, mst.hxx:196-199 — here
the result is deterministic).

Works on undirected graphs stored with both directed copies present.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from essentials_tpu.framework.enactor import enact, EnactResult
from essentials_tpu.graph.graph import Graph
from essentials_tpu.ops.segment import segment_combine
from essentials_tpu.ops.configs import Combine

INT_MAX = jnp.iinfo(jnp.int32).max


class MstState(NamedTuple):
    comp: jax.Array        # int32[Vp] component (root) per vertex
    in_mst: jax.Array      # bool[Ep] chosen edges (CSR edge-id order)
    changed: jax.Array     # did the last round merge anything


class MstResult(NamedTuple):
    in_mst: jax.Array      # bool[E] over CSR edge ids (one direction chosen)
    total_weight: float
    iterations: int
    elapsed_ms: float


def init(g: Graph) -> MstState:
    vp = g.n_vertices_padded
    comp = jnp.arange(vp, dtype=jnp.int32)
    return MstState(comp, jnp.zeros(g.n_edges_padded, jnp.bool_),
                    jnp.asarray(True))


def _float_order_key(w: jax.Array) -> jax.Array:
    """Order-preserving float32 -> int32 map (signed comparison)."""
    i = jax.lax.bitcast_convert_type(w.astype(jnp.float32), jnp.int32)
    flip = jnp.bitwise_and(jax.lax.shift_right_arithmetic(i, 31),
                           jnp.int32(0x7FFFFFFF))
    return jnp.bitwise_xor(i, flip)


def _expand_by_src(g: Graph, vals):
    from essentials_tpu.ops.advance import _expand_src_multi
    return _expand_src_multi(g, vals)


def _expand_by_dst_to_csr(g: Graph, v):
    """v[dst(e)] on the CSR edge axis: expand over the CSC offsets, route
    CSC->CSR (fused chain when available)."""
    from essentials_tpu.ops.segment import (expand_multi_then_route,
                                            expand_vertex_to_edges,
                                            apply_permutation)
    ep = g.n_edges_padded
    if g.off_route_csc is not None and g.route_bwd is not None:
        from essentials_tpu.ops.cube_router import chainable
        if chainable(g.off_route_csc.plan, g.route_bwd):
            return expand_multi_then_route((v,), g.off_route_csc,
                                           g.route_bwd, n_valid=ep)[0]
    exp = expand_vertex_to_edges(v, g.csc_offsets, ep)
    return apply_permutation(g.csc_edge_ids, exp)


def _combine_src_min(g: Graph, vals: jax.Array) -> jax.Array:
    from essentials_tpu.ops.segment import (combine_by_offsets_routed,
                                            combine_by_offsets)
    if g.off_route_csr is not None:
        return combine_by_offsets_routed(vals, g.off_route_csr, Combine.MIN,
                                         g.csr_seg_flags)
    return combine_by_offsets(vals, g.row_offsets, Combine.MIN,
                              g.csr_seg_flags)


def step(g: Graph, state: MstState, it) -> MstState:
    """One Borůvka round, two-level argmin (VERDICT round-1 item #5):

    edge level (static CSR segments, gather-free engine): per VERTEX, the
    lexicographic-min cross edge (weight, then dst) — valid pre-reduction
    because comp is constant within a vertex's out-edges, and within one
    vertex min-dst IS the canonical-undirected-key order.
    vertex level (V-sized, scatter): per COMPONENT, min over its member
    vertices' candidates with full (w, cu, cv) tiebreak. Replaces the
    E-sized dynamic-key scatters (~7.5 ns/elem) with V-sized ones."""
    comp, in_mst, _ = state
    vp = g.n_vertices_padded
    ep = g.n_edges_padded
    iota_v = jnp.arange(vp, dtype=jnp.int32)

    # --- edge level: engine chains over static src segments ---
    comp_src = _expand_by_src(g, (comp,))[0]
    comp_dst = _expand_by_dst_to_csr(g, comp)
    cross = (comp_src != comp_dst) & g.edge_mask()

    wkey = jnp.where(cross, _float_order_key(g.values), INT_MAX)
    wmin_v = _combine_src_min(g, wkey)                      # [Vp]
    wmin_e = _expand_by_src(g, (jnp.where(wmin_v == INT_MAX, INT_MAX - 1,
                                          wmin_v),))[0]
    at_min = cross & (wkey == wmin_e)
    dx = jnp.where(at_min, g.col_indices, INT_MAX)
    dmin_v = _combine_src_min(g, dx)                        # [Vp]
    dmin_e = _expand_by_src(g, (jnp.where(dmin_v == INT_MAX, INT_MAX - 1,
                                          dmin_v),))[0]
    eid = jnp.arange(ep, dtype=jnp.int32)
    ex = jnp.where(at_min & (g.col_indices == dmin_e), eid, INT_MAX)
    emin_v = _combine_src_min(g, ex)                        # [Vp] per-vertex

    # --- vertex level: per-component lexicographic (w, cu, cv) argmin ---
    has_cand = wmin_v < INT_MAX
    cu = jnp.minimum(iota_v, dmin_v)
    cv = jnp.maximum(iota_v, dmin_v)
    kw = dict(num_segments=vp, indices_are_sorted=False)
    wminc = jax.ops.segment_min(wmin_v, comp, **kw)
    at_w = has_cand & (wmin_v == wminc[comp])
    uminc = jax.ops.segment_min(jnp.where(at_w, cu, INT_MAX), comp, **kw)
    at_u = at_w & (cu == uminc[comp])
    vminc = jax.ops.segment_min(jnp.where(at_u, cv, INT_MAX), comp, **kw)
    at_v = at_u & (cv == vminc[comp])
    eminc = jax.ops.segment_min(jnp.where(at_v, emin_v, INT_MAX), comp, **kw)

    has_edge = eminc < INT_MAX
    safe_e = jnp.where(has_edge, eminc, 0)
    target = jnp.where(has_edge, comp[g.col_indices[safe_e]], iota_v)

    # resolve mutual hooks: the smaller root stays a root
    mutual = (target[target] == iota_v) & (iota_v < target)
    parent = jnp.where(mutual, iota_v, target)

    # record each actually-hooking component's chosen edge
    hooks = has_edge & (parent != iota_v)
    in_mst = in_mst.at[jnp.where(hooks, safe_e, ep - 1)].max(
        hooks & g.edge_mask()[safe_e])

    # pointer jumping until stable (hook trees are shallow: 2-3 jumps).
    # BOUNDED: malformed inputs (asymmetric weights on an "undirected"
    # graph) can produce hook cycles; the bound turns a device hang into a
    # wrong-but-terminating answer the validator catches.
    depth = max(int(np.ceil(np.log2(max(vp, 2)))), 1) + 2

    def not_flat(c):
        p, i = c
        return jnp.any(p[p] != p) & (i < depth)

    parent, _ = jax.lax.while_loop(
        not_flat, lambda c: (c[0][c[0]], c[1] + 1), (parent, jnp.int32(0)))
    new_comp = parent[comp]

    changed = jnp.any(hooks)
    return MstState(new_comp, in_mst, changed)


def converged(g: Graph, state: MstState, it) -> jax.Array:
    return jnp.logical_not(state.changed)


def run(g: Graph, *, max_iterations: int | None = None,
        warmup: bool = True) -> MstResult:
    max_it = max_iterations if max_iterations is not None else \
        max(int(np.ceil(np.log2(max(g.n_vertices, 2)))) + 2, 3)
    res: EnactResult = enact(step, converged, g, init(g),
                             max_iterations=max_it, warmup=warmup)
    in_mst = res.state.in_mst[:g.n_edges]
    total = float(jnp.sum(jnp.where(in_mst, g.values[:g.n_edges], 0.0)))
    return MstResult(in_mst, total, res.iterations, res.elapsed_ms)


def cpu_reference(csr) -> float:
    """Host Kruskal total-weight reference (reference parity:
    examples/algorithms/mst/mst_cpu.hxx)."""
    n = csr.n_rows
    off = np.asarray(csr.row_offsets)
    cols = np.asarray(csr.col_indices)
    vals = np.asarray(csr.values, np.float64)
    src = np.repeat(np.arange(n), np.diff(off))
    keep = src < cols  # one copy per undirected edge
    edges = sorted(zip(vals[keep], src[keep], cols[keep]))
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    total = 0.0
    for w, u, v in edges:
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            parent[ru] = rv
            total += w
    return total
