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


def step(g: Graph, state: MstState, it) -> MstState:
    comp, in_mst, _ = state
    vp = g.n_vertices_padded
    src, dst, w = g.src_indices, g.col_indices, g.values
    eid = jnp.arange(g.n_edges_padded, dtype=jnp.int32)

    cs, cd = comp[src], comp[dst]
    cross = (cs != cd) & g.edge_mask()

    # 1. min weight per component (over its outgoing cross edges)
    wx = jnp.where(cross, w, jnp.inf)
    wmin = segment_combine(wx, cs, vp, Combine.MIN, indices_are_sorted=False)

    # 2. canonical-key tiebreak among weight-minimal edges: both endpoints of
    # a weight tie must agree on ONE undirected edge, so break on
    # (min(u,v), max(u,v)) in two staged int32 segment-MIN passes.
    cu = jnp.minimum(src, dst)
    cv = jnp.maximum(src, dst)
    at_min = cross & (w == wmin[cs])
    ux = jnp.where(at_min, cu, INT_MAX)
    umin = segment_combine(ux, cs, vp, Combine.MIN, indices_are_sorted=False)
    at_u = at_min & (cu == umin[cs])
    vx = jnp.where(at_u, cv, INT_MAX)
    vmin = segment_combine(vx, cs, vp, Combine.MIN, indices_are_sorted=False)

    # 3. directed-copy edge id for the winning undirected edge (per component)
    ex = jnp.where(at_u & (cv == vmin[cs]), eid, INT_MAX)
    emin = segment_combine(ex, cs, vp, Combine.MIN, indices_are_sorted=False)

    has_edge = emin < INT_MAX
    safe_e = jnp.where(has_edge, emin, 0)
    target = jnp.where(has_edge, comp[dst[safe_e]], jnp.arange(vp, dtype=jnp.int32))

    # 4. resolve mutual hooks: the smaller root stays a root
    mutual = (target[target] == jnp.arange(vp)) & (jnp.arange(vp) < target)
    parent = jnp.where(mutual, jnp.arange(vp, dtype=jnp.int32), target)

    # 5. record each actually-hooking component's chosen edge
    hooks = has_edge & (parent != jnp.arange(vp))
    in_mst = in_mst.at[jnp.where(hooks, safe_e, g.n_edges_padded - 1)].max(
        hooks & g.edge_mask()[safe_e])

    # 6. pointer jumping to full depth (log2(Vp) rounds)
    depth = max(int(np.ceil(np.log2(max(vp, 2)))), 1)
    parent = jax.lax.fori_loop(0, depth, lambda _, p: p[p], parent)
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
