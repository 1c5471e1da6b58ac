"""Isolate tfbc-form kernel costs: time 3/5/7-kernel chains at rmat20
scale and solve for per-kernel-type cost (K1+K3 ends, K2 middle, Kmid).

Also times the same chain shapes at rmat18 (wbc form) for comparison.
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

R = 16


def timeit(fn, *args):
    @partial(jax.jit, static_argnums=(len(args),))
    def replay(*a):
        n = a[-1]
        x = a[0]

        def body(i, x):
            return fn(x, *a[1:-1])
        out = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(out.ravel()[:8])

    def fetch(n):
        t = time.perf_counter()
        float(replay(*args, n))
        return time.perf_counter() - t

    fetch(1)
    fetch(R)
    best = float("inf")
    for _ in range(3):
        d1 = fetch(1)
        dR = fetch(R)
        best = min(best, max((dR - d1) / (R - 1), 1e-9))
    return best * 1e3


def profile(name, g):
    from essentials_tpu.ops.cube_router import (apply_cube_plan,
                                                apply_cube_chain,
                                                apply_cube_chain_n)
    pa = g.off_route_csr.plan
    pb = g.route_fwd
    pc = g.off_route_csc.inv_plan
    L = pa.length
    x0 = jnp.arange(L, dtype=jnp.int32) % 97

    t3 = timeit(lambda x, : (apply_cube_plan((x,), pa)[0] + 1), x0)
    t5 = timeit(lambda x, : (apply_cube_chain((x,), pa, pb)[0] + 1), x0)
    t7 = timeit(lambda x, : (apply_cube_chain_n(
        (x,), [pa, pb, pc], ["incl", "excl"])[0] + 1), x0)
    # t3 = ends + K2; t5 = ends + 2*K2 + mid; t7 = ends + 3*K2 + 2*mid
    k2 = t7 - 2 * t5 + t3  # wait: solve properly below
    # system: t3 = E + 1*K2 ; t5 = E + 2*K2 + 1*M ; t7 = E + 3*K2 + 2*M
    # => t7 - t5 = K2 + M ; t5 - t3 = K2 + M  (degenerate) — report raws
    per_pass3 = t3 / 3
    per_pass5 = t5 / 5
    per_pass7 = t7 / 7
    gbs = L * 8 / (per_pass7 / 1e3) / 1e9
    print(f"{name}: L={L} form={pa.form} wide={pa.wide}")
    print(f"  3k route      {t3:7.3f} ms ({per_pass3:5.3f}/pass)")
    print(f"  5k chain      {t5:7.3f} ms ({per_pass5:5.3f}/pass)")
    print(f"  7k chain      {t7:7.3f} ms ({per_pass7:5.3f}/pass, "
          f"{gbs:5.0f} GB/s r+w)", flush=True)
    print(f"  K2+mid increment: {t5 - t3:6.3f} ms;  {t7 - t5:6.3f} ms")


def main():
    from essentials_tpu.formats import Csr
    from essentials_tpu.graph import build_graph
    from essentials_tpu.io import generate

    coo = generate.rmat(18, 16, seed=1, undirected=True, weighted=False)
    g18 = build_graph(Csr.from_coo(coo), directed=False, weighted=False)
    profile("rmat18 (wbc)", g18)
    del g18

    coo = generate.rmat(20, 30, seed=3, undirected=False, weighted=True)
    g20 = build_graph(Csr.from_coo(coo), directed=True, weighted=True)
    profile("rmat20 (tfbc)", g20)


if __name__ == "__main__":
    main()
