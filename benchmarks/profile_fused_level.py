"""Per-phase on-device timing of the fused BFS level (bench.py's rmat18).

Each phase is replayed R times inside one jitted fori_loop with a data
dependency between iterations, so dispatch/RPC latency is amortized away
(the same protocol as bench.py). Reported: per-iteration ms after
subtracting the R=1 dispatch floor.

Phases:
  copy     x+1 over one [L] int32 array (HBM round-trip floor)
  route    fused_route_or: eq + 3-kernel cube route + segmented OR
  suffix   suffix_fill_update kernel
  level    full fused_superstep (route + suffix)
  init     init_lev_exp (expand source level to edge axis)
  collapse collapse_lev_exp (edge-axis levels -> vertex distances)
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

R = 32


def replay_time(make_body, x0):
    """Median per-iter ms of body inside fori_loop, dispatch-corrected."""
    @partial(jax.jit, static_argnums=(1,))
    def run(x, n):
        return jax.lax.fori_loop(0, n, make_body, x)

    def timed(n):
        t0 = time.perf_counter()
        out = run(x0, n)
        _ = float(np.asarray(out).reshape(-1)[0])   # value-fetch fence
        return (time.perf_counter() - t0) * 1e3

    timed(1); timed(R)
    vals = []
    for _ in range(5):
        t1 = timed(1)
        tR = timed(R)
        vals.append(max((tR - t1) / (R - 1), 1e-6))
    return float(np.median(vals))


def main():
    from essentials_tpu.formats import Csr
    from essentials_tpu.graph import build_graph
    from essentials_tpu.io import generate
    from essentials_tpu.algorithms import bfs
    from essentials_tpu.ops import fused_bfs as FB

    coo = generate.rmat(18, 16, seed=1, undirected=True, weighted=False)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=False)
    E = g.n_edges
    L = g.route_fwd.length
    print(f"E={E} L={L} form={g.route_fwd.form} wide={g.route_fwd.wide}")

    lev0 = FB.init_lev_exp(g, 0)

    def b_copy(i, x):
        return x + 1

    def b_route(i, x):
        return FB.fused_route_or(g, x, i) + x   # keep dtype/shape, chain dep

    def b_suffix(i, x):
        lev2, _ = FB.suffix_fill_update(x, g.csc_seg_flags, x, i)
        return lev2

    def b_level(i, x):
        lev2, _ = FB.fused_superstep(g, x, i)
        return lev2

    def b_init(i, x):
        return FB.init_lev_exp(g, x[0] & 1023) + x[:1]

    def b_collapse(i, x):
        v = FB.collapse_lev_exp(g, x, 0)
        return x + v[0]

    t_copy = replay_time(b_copy, lev0)
    t_route = replay_time(b_route, lev0)
    t_suffix = replay_time(b_suffix, lev0)
    t_level = replay_time(b_level, lev0)
    t_init = replay_time(b_init, lev0)
    t_coll = replay_time(b_collapse, lev0)

    def gbs(nbytes, ms):
        return nbytes / (ms * 1e-3) / 1e9

    print(f"copy     {t_copy:7.3f} ms   {gbs(L*8, t_copy):6.1f} GB/s (rw)")
    print(f"route    {t_route:7.3f} ms   model 31B/elem -> "
          f"{gbs(31*L, t_route):6.1f} GB/s-eff")
    print(f"suffix   {t_suffix:7.3f} ms   model 13B/elem -> "
          f"{gbs(13*L, t_suffix):6.1f} GB/s-eff")
    print(f"level    {t_level:7.3f} ms   ({E/1e6/(t_level*1e-3):7.0f} "
          f"MTEPS/level-equiv)")
    print(f"init     {t_init:7.3f} ms")
    print(f"collapse {t_coll:7.3f} ms")


if __name__ == "__main__":
    main()
