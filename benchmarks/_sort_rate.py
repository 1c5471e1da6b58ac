"""Measure lax.sort throughput (2-key int32) at 16/33/67M on the chip.
Value-fetch sync (block_until_ready is lazy on tunneled runtimes)."""
import time
import jax
import jax.numpy as jnp
import numpy as np

for n in (1 << 24, 1 << 25, 1 << 26):
    k1 = jnp.asarray(np.random.randint(0, 1 << 20, n, np.int32))
    k2 = jnp.asarray(np.random.randint(0, 1 << 21, n, np.int32))

    @jax.jit
    def f(k1, k2):
        s1, s2 = jax.lax.sort((k1, k2), num_keys=2)
        return jnp.sum(s1 % 97) + jnp.sum(s2 % 97)

    _ = int(f(k1, k2))
    cyc = []
    for _i in range(3):
        t0 = time.perf_counter()
        _ = int(f(k1, k2))
        cyc.append((time.perf_counter() - t0) * 1e3)
    m = float(np.median(cyc))
    print(f"n={n>>20}M: {m:.1f} ms ({n/m*1e3/1e6:.0f}M rec/s)", flush=True)
