"""Does lax.cond actually skip the untaken branch on this TPU runtime?

If cond lowers to select (both branches execute), the adaptive
spray/dense gating in bfs.step pays for BOTH paths every level.
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
        t1, tR = once(1), once(runs)
        best = min(best, max((tR - t1) / (runs - 1), 1e-6))
    return best


def main():
    n = 1 << 22
    x = jnp.ones(n, jnp.float32)

    def cheap(v):
        return v + 1.0

    def costly(v):
        # ~40 HBM round trips of 16MB
        for _ in range(20):
            v = jnp.tanh(v) + 1.0
        return v

    def mk(pred_val):
        pred = jnp.asarray(pred_val)

        def f(v):
            return jax.lax.cond(pred & (v[0] < jnp.inf),
                                costly, cheap, v)
        return f

    t_true = timeit(mk(True), x)
    t_false = timeit(mk(False), x)
    t_base_costly = timeit(costly, x)
    t_base_cheap = timeit(cheap, x)
    print(f"cond(True->costly): {t_true:.3f} ms")
    print(f"cond(False->cheap): {t_false:.3f} ms")
    print(f"costly alone:       {t_base_costly:.3f} ms")
    print(f"cheap alone:        {t_base_cheap:.3f} ms")
    verdict = "BOTH-BRANCHES" if t_false > 0.5 * t_base_costly else "ok: real branch"
    print("verdict:", verdict)

    # same but with a pallas kernel in the costly branch
    from essentials_tpu.ops.scan_kernels import scan_1d

    def costly_pl(v):
        for _ in range(10):
            v = scan_1d(v, "add")
        return v

    def mkp(pred_val):
        pred = jnp.asarray(pred_val)

        def f(v):
            return jax.lax.cond(pred & (v[0] < jnp.inf), costly_pl, cheap, v)
        return f

    tp_true = timeit(mkp(True), x)
    tp_false = timeit(mkp(False), x)
    print(f"cond(True->pallas scan x10):  {tp_true:.3f} ms")
    print(f"cond(False->cheap):           {tp_false:.3f} ms")


if __name__ == "__main__":
    main()
