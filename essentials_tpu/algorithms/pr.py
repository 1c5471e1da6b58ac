"""PageRank (push-style with dangling-mass redistribution).

Reference parity: gunrock::pr (/root/reference/include/gunrock/algorithms/
pr.hxx:77-216): precomputed inverse out-weight-sums, dangling-rank
redistribution, atomicAdd spread, L1/L-inf convergence. TPU-native: the
spread is one segment-SUM over the dst-sorted edge axis; convergence is an
on-device reduction inside the while_loop (the reference pays a host
round-trip per iteration, pr.hxx:155-178).
"""

from __future__ import annotations

from typing import NamedTuple
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from essentials_tpu.framework.enactor import enact, EnactResult
from essentials_tpu.graph.graph import Graph
from essentials_tpu.ops import advance, neighbor_reduce, Combine, AdvanceIO


class PrState(NamedTuple):
    ranks: jax.Array        # float32[Vp]
    err: jax.Array          # scalar L1 delta of last step
    iweights: jax.Array     # float32[Vp]: alpha / sum of out-edge weights
    alpha: jax.Array        # scalar
    tol: jax.Array          # scalar


class PrResult(NamedTuple):
    ranks: jax.Array
    iterations: int
    elapsed_ms: float


def init(g: Graph, alpha: float = 0.85, tol: float = 1e-6) -> PrState:
    vp = g.n_vertices_padded
    # Reference pr.hxx:77-90: iweight[v] = alpha / sum_w(out edges of v).
    wsum = neighbor_reduce(g, lambda e: e.weight, combine=Combine.SUM)
    iweights = jnp.where(wsum > 0, alpha / wsum, 0.0).astype(jnp.float32)
    ranks = jnp.where(g.vertex_mask(), 1.0 / g.n_vertices, 0.0).astype(jnp.float32)
    return PrState(ranks, jnp.asarray(jnp.inf, jnp.float32), iweights,
                   jnp.asarray(alpha, jnp.float32), jnp.asarray(tol, jnp.float32))


def step(g: Graph, state: PrState, it) -> PrState:
    ranks, _, iweights, alpha, tol = state
    # dangling mass (vertices with no out-weight) redistributed uniformly
    dangling = jnp.sum(jnp.where((iweights == 0.0) & g.vertex_mask(), ranks, 0.0))
    base = (1.0 - alpha) / g.n_vertices + alpha * dangling / g.n_vertices
    contrib = ranks * iweights          # per-vertex work stays on the vertex axis
    spread = advance(g, lambda e: e.src_vals[0] * e.weight, None,
                     src_values=(contrib,), input_kind=AdvanceIO.GRAPH,
                     combine=Combine.SUM, with_frontier=False)
    new_ranks = jnp.where(g.vertex_mask(), base + spread, 0.0)
    err = jnp.sum(jnp.abs(new_ranks - ranks))
    return PrState(new_ranks, err, iweights, alpha, tol)


def converged(g: Graph, state: PrState, it) -> jax.Array:
    return state.err < state.tol


def fused_supported(g: Graph) -> bool:
    return bool(g.symmetric_layout and g.route_fwd is not None
                and g.off_route_csr is not None)


@partial(jax.jit, static_argnums=(2, 3, 4))
def _run_fused_compiled(g: Graph, iweights, alpha, tol, max_iterations):
    """Power iteration on the edge axis (symmetric graphs): state is
    r_exp[p] = rank[segment(p)] — per iteration: contrib -> route ->
    weighted segmented SUM -> segment-total broadcast, all edge-axis
    passes (~8 instead of the generic engine's ~14 + vertex moves).
    Isolated (degree-0) vertices share one scalar rank (they all equal
    base every iteration)."""
    from essentials_tpu.ops.permute import apply_plan
    from essentials_tpu.ops.scan_kernels import segmented_scan
    from essentials_tpu.ops.fused_bfs import segment_broadcast_total
    from essentials_tpu.ops.segment import expand_vertex_to_edges_routed

    ep = g.n_edges_padded
    n = g.n_vertices
    route = g.off_route_csr
    n_seg = route.n_seg
    iw_v = jnp.pad(iweights, (0, n_seg - iweights.shape[0]))
    iw_exp = expand_vertex_to_edges_routed(iw_v, route)
    r_exp0 = jnp.full(ep, 1.0 / n, jnp.float32)
    valid = (jnp.arange(ep) < g.n_edges)
    rep = g.csc_seg_flags & valid                   # segment representatives
    deg0 = (g.row_offsets[1:] - g.row_offsets[:-1]) == 0
    n_iso = jnp.sum(deg0 & g.vertex_mask()).astype(jnp.float32)

    def cond(c):
        r_exp, r_iso, err, it = c
        return (it < max_iterations) & (err > tol)

    def body(c):
        r_exp, r_iso, _, it = c
        dangling = jnp.sum(jnp.where(rep & (iw_exp == 0.0), r_exp, 0.0)) \
            + n_iso * r_iso
        base = (1.0 - alpha) / n + alpha * dangling / n
        contrib = r_exp * iw_exp
        z = apply_plan(contrib, g.route_fwd, n_valid=ep)
        m = jnp.where(valid, z * g.csc_values, 0.0)
        S = segmented_scan(m, g.csc_seg_flags, "add")
        pulled = segment_broadcast_total(S, g.csc_seg_flags)
        r_new = jnp.where(valid, base + pulled, r_exp)
        err = jnp.sum(jnp.where(rep, jnp.abs(r_new - r_exp), 0.0)) \
            + n_iso * jnp.abs(base - r_iso)
        return r_new, base, err, it + 1

    r_exp, r_iso, _, it = jax.lax.while_loop(
        cond, body, (r_exp0, jnp.float32(1.0 / n), jnp.float32(jnp.inf),
                     jnp.int32(0)))
    # collapse to the vertex axis
    picked = apply_plan(r_exp, route.inv_plan, n_valid=n_seg + 1)
    ff = segmented_scan(picked, route.run_start, "first")
    ranks = jnp.where(route.seg_len > 0, ff[:n_seg], r_iso)
    vp = g.n_vertices_padded
    ranks = jnp.where(g.vertex_mask(), ranks[:vp], 0.0)
    return ranks, it


def _spmv_engine_call(g, plan, x, unit: bool = False):
    """One y = A @ x on the best available engine: windowed 3-kernel
    (plan is not None), the 7-kernel fused chain, or the generic pull
    path. Trace-time dispatch (plan rides as a jit argument). unit=True
    drops the weight factor (unweighted sum)."""
    from essentials_tpu.algorithms import spmv as SP
    from essentials_tpu.ops import neighbor_reduce, Combine
    if plan is not None:
        from essentials_tpu.ops.windowed_spmv import spmv_windowed as _w
        return _w(g, plan, x, unit=unit)
    from essentials_tpu.ops.fused_spmv import spmv_fused as _f
    if SP.fused_supported(g):
        return _f(g, x, unit=unit)
    if unit:
        return neighbor_reduce(g, lambda e: e.dst_vals[0],
                               dst_values=(x,), combine=Combine.SUM)
    return SP.spmv_pull(g, x)


def spmv_plan(g: Graph):
    """The windowed SpMV plan when it builds on this backend, else None
    (callers fall back to the chain/pull engines)."""
    from essentials_tpu.algorithms import spmv as SP
    import jax as _jax
    if _jax.default_backend() == "tpu" and SP.fused_supported(g) \
            and getattr(g.route_bwd, "form", None) == "tfbc":
        return SP.windowed_plan(g)
    return None


@partial(jax.jit, static_argnums=(5,))
def _run_spmv_compiled(g: Graph, plan, iweights, alpha, tol,
                       max_iterations):
    """Power iteration with the whole spread as ONE SpMV-engine call per
    iteration (windowed: 3 kernels) — the VERDICT r4 #2 port: the fused
    chain IS a weighted advance, so PR shares it instead of cloning an
    edge-axis module. State stays on the vertex axis ([V] ops are noise
    next to the [E] sweep)."""
    n = g.n_vertices
    mask = g.vertex_mask()
    r0 = jnp.where(mask, 1.0 / n, 0.0).astype(jnp.float32)
    dang_mask = (iweights == 0.0) & mask

    def cond(c):
        r, err, it = c
        return (it < max_iterations) & (err > tol)

    def body(c):
        r, _, it = c
        dangling = jnp.sum(jnp.where(dang_mask, r, 0.0))
        base = (1.0 - alpha) / n + alpha * dangling / n
        contrib = r * iweights
        spread = _spmv_engine_call(g, plan, contrib)
        if spread.shape[0] < r.shape[0]:
            spread = jnp.pad(spread, (0, r.shape[0] - spread.shape[0]))
        r_new = jnp.where(mask, base + spread[:r.shape[0]], 0.0)
        err = jnp.sum(jnp.abs(r_new - r))
        return r_new, err, it + 1

    r, _, it = jax.lax.while_loop(
        cond, body, (r0, jnp.float32(jnp.inf), jnp.int32(0)))
    return r, it


def run(g: Graph, *, alpha: float = 0.85, tol: float = 1e-6,
        max_iterations: int = 500, warmup: bool = True,
        variant: str = "auto") -> PrResult:
    """variant: 'auto' (spmv engine — windowed 3-kernel where the plan
    builds), 'spmv', 'fused' (edge-axis power iteration), 'generic'.
    The spmv engine computes the src-keyed pull sum, which equals PR's
    dst-keyed spread only when A == A^T (symmetric layout); directed
    graphs use the fused/generic push formulation."""
    if (variant == "auto" and g.symmetric_layout) or variant == "spmv":
        import time as _time
        st0 = init(g, alpha, tol)
        plan = spmv_plan(g)
        if warmup:
            int(_run_spmv_compiled(g, plan, st0.iweights, alpha, tol,
                                   max_iterations)[1])
        t0 = _time.perf_counter()
        ranks, it = _run_spmv_compiled(g, plan, st0.iweights, alpha, tol,
                                       max_iterations)
        it_val = int(it)
        jax.block_until_ready(ranks)
        return PrResult(ranks[:g.n_vertices], it_val,
                        (_time.perf_counter() - t0) * 1e3)
    use_fused = variant == "fused" and fused_supported(g)
    if use_fused:
        import time as _time
        st0 = init(g, alpha, tol)
        if warmup:
            int(_run_fused_compiled(g, st0.iweights, alpha, tol,
                                    max_iterations)[1])
        t0 = _time.perf_counter()
        ranks, it = _run_fused_compiled(g, st0.iweights, alpha, tol,
                                        max_iterations)
        it_val = int(it)
        jax.block_until_ready(ranks)
        return PrResult(ranks[:g.n_vertices], it_val,
                        (_time.perf_counter() - t0) * 1e3)
    res: EnactResult = enact(step, converged, g, init(g, alpha, tol),
                             max_iterations=max_iterations, warmup=warmup)
    return PrResult(res.state.ranks[:g.n_vertices], res.iterations,
                    res.elapsed_ms)


def cpu_reference(csr, alpha: float = 0.85, tol: float = 1e-6,
                  max_iterations: int = 500) -> np.ndarray:
    """Host power iteration with weighted spread + dangling redistribution."""
    n = csr.n_rows
    off = np.asarray(csr.row_offsets)
    cols = np.asarray(csr.col_indices)
    vals = np.asarray(csr.values, np.float64)
    wsum = np.zeros(n)
    np.add.at(wsum, np.repeat(np.arange(n), np.diff(off)), vals)
    src = np.repeat(np.arange(n), np.diff(off))
    pr = np.full(n, 1.0 / n)
    for _ in range(max_iterations):
        contrib = np.where(wsum > 0, alpha * pr / np.maximum(wsum, 1e-300), 0.0)
        nxt = np.zeros(n)
        np.add.at(nxt, cols, contrib[src] * vals)
        dangling = pr[wsum == 0].sum()
        new = (1 - alpha) / n + alpha * dangling / n + nxt
        if np.abs(new - pr).sum() < tol:
            return new.astype(np.float32)
        pr = new
    return pr.astype(np.float32)
