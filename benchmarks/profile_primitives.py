"""Microbench: XLA gather/scatter/sort costs at sparse-path sizes (real chip).

Ground truth for sizing the sparse-frontier path: the segment engine exists
because E-sized arbitrary gathers serialize (~7.5 ns/elem measured round 1);
this measures the SMALL sizes (1K..256K) where the sparse path lives, plus
the MXU one-hot scatter alternative.
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, arg, runs=32, cycles=3):
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
    V = 262144
    table_i32 = jnp.arange(V, dtype=jnp.int32)
    res = {}
    for B in (1024, 4096, 16384, 65536, 262144):
        idx = jnp.asarray(np.random.randint(0, V, B).astype(np.int32))

        def gath(i):
            return (table_i32[i] + 1) % V
        res[f"gather_B{B}_tabV"] = timeit(gath, idx)

        def scat(i):
            out = jnp.zeros(V, jnp.int8).at[i].max(jnp.int8(1), mode="drop")
            return (i + out[:B]) % V
        res[f"scatter_B{B}_to_V"] = timeit(scat, idx)

        def srt(i):
            return jax.lax.sort(i + 1) % V
        res[f"sort_B{B}"] = timeit(srt, idx)

        # MXU one-hot scatter-count: [2048,B]bf16 @ [B,128]bf16 -> [2048,128]
        def onehot(i):
            r = (i >> 7).astype(jnp.int32)
            l = (i & 127).astype(jnp.int32)
            oh_r = (r[None, :] == jnp.arange(V // 128, dtype=jnp.int32)[:, None]).astype(jnp.bfloat16)
            oh_l = (l[:, None] == jnp.arange(128, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
            cnt = jnp.dot(oh_r, oh_l, preferred_element_type=jnp.float32)
            return (i + (cnt.reshape(-1)[:B] > 0).astype(jnp.int32)) % V
        res[f"onehot_scatter_B{B}"] = timeit(onehot, idx)

        # small-table gather: B lookups into a B-sized table
        small = jnp.arange(B, dtype=jnp.int32)
        idxs = jnp.asarray(np.random.randint(0, B, B).astype(np.int32))

        def gsm(i):
            return (small[i] + 1) % B
        res[f"gather_B{B}_tabB"] = timeit(gsm, idxs)

    for k, v in sorted(res.items()):
        print(f"{k:>28}: {v * 1e3:9.1f} us")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
