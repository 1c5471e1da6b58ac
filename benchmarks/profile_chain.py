"""Decompose the fused expand chain cost (real chip).

expand_chain measured ~0.89 ms vs ~0.52 ms expected (5 kernels at the
~0.105 ms/kernel route rate) — this isolates each stage.
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, arg, runs=16, cycles=3):
    @partial(jax.jit, static_argnums=(1,))
    def replay(a, R):
        return jax.lax.fori_loop(0, R, lambda i, s: fn(s), a)

    def once(R):
        t0 = time.perf_counter()
        out = replay(arg, R)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        return (time.perf_counter() - t0) * 1e3

    once(1); once(runs)
    best = float("inf")
    for _ in range(cycles):
        t1 = once(1)
        tR = once(runs)
        best = min(best, max((tR - t1) / (runs - 1), 1e-6))
    return best


def main():
    from essentials_tpu.formats import Csr
    from essentials_tpu.graph import build_graph
    from essentials_tpu.io import generate
    from essentials_tpu.ops.cube_router import (apply_cube_plan,
                                                apply_cube_chain)
    from essentials_tpu.ops.segment import _run_totals

    coo = generate.rmat(18, 16, seed=1, undirected=True, weighted=False)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=False)
    ep = g.n_edges_padded
    plan_off = g.off_route_csr.plan
    plan_fwd = g.route_fwd
    L = plan_fwd.length
    print(f"Ep={ep} L={L} form={plan_fwd.form} wide={plan_fwd.wide}")

    x = jnp.arange(L, dtype=jnp.int32) % 977

    r = {}
    r["route_fwd"] = timeit(
        lambda v: apply_cube_plan(((v + 1),), plan_fwd)[0], x)
    r["route_off"] = timeit(
        lambda v: apply_cube_plan(((v + 1),), plan_off)[0], x)
    r["route_off_postscan"] = timeit(
        lambda v: apply_cube_plan(((v + 1),), plan_off, post_scan=True)[0], x)
    r["chain_i32"] = timeit(
        lambda v: apply_cube_chain(((v + 1),), plan_off, plan_fwd)[0], x)
    r["chain_2pay"] = timeit(
        lambda v: apply_cube_chain((v + 1, v + 2), plan_off, plan_fwd)[0], x)

    vv = jnp.arange(g.n_vertices_padded, dtype=jnp.int32)

    def full_expand(v):
        d = jnp.diff(v, prepend=jnp.zeros(1, jnp.int32))
        dd = _run_totals(d, g.off_route_csr)
        return apply_cube_chain((dd,), plan_off, plan_fwd, n_valid=ep)[0][0] + v
    r["vops_plus_chain"] = timeit(full_expand, vv)

    for k, v in r.items():
        print(f"{k:>20}: {v:8.3f} ms")


if __name__ == "__main__":
    main()
