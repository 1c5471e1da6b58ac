"""Micro: block scan with PACKED row-summary ladder vs current [R,1] ladder.

Hypothesis: the row-ladder on [R,1] summaries costs full physical VPU
width (1 useful lane of 128), so 10 log-steps cost ~10 full passes;
packing summaries into [R/128, 128] makes those steps 128x denser.
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from essentials_tpu.ops.scan_kernels import (_block_scan, _shift_lanes,
                                             _shift_rows, LANES)

R = 16
_ROWS = 1024


def bench(name, fn, x, n_bytes):
    @partial(jax.jit, static_argnums=(1,))
    def replay(x, n):
        def body(i, x):
            return fn(x)
        return jnp.sum(jax.lax.fori_loop(0, n, body, x).ravel()[:8])

    def fetch(n):
        t = time.perf_counter()
        float(replay(x, n))
        return time.perf_counter() - t

    fetch(1); fetch(R)
    best = min(max((fetch(R) - fetch(1)) / (R - 1), 1e-9) for _ in range(3))
    print(f"{name:44s} {best*1e3:8.3f} ms ({n_bytes/best/1e9:6.1f} GB/s-model)",
          flush=True)


def packed_kernel(x_ref, o_ref, carry):
    @pl.when(pl.program_id(0) == 0)
    def _():
        carry[0] = jnp.float32(0)
    v = x_ref[:, :]                               # [1024, 128]
    rows = v.shape[0]
    ident = jnp.float32(0)
    # lane ladder (7 steps, full width)
    k = 1
    while k < LANES:
        v = _shift_lanes(v, k, ident) + v
        k *= 2
    # row summaries packed: tile-transpose [8,128,128] so row sums land
    # on the lane axis -> [8, 128] (1 pass instead of a [R,1] ladder)
    v3 = v.reshape(rows // LANES, LANES, LANES)
    rs = jnp.swapaxes(v3, 1, 2)[:, LANES - 1, :]  # [8, 128] row sums
    # exclusive prefix of rs in flat row order: lane ladder on [8,128]
    ex = _shift_lanes(rs, 1, ident)
    k = 1
    while k < LANES:
        ex = _shift_lanes(ex, k, ident) + ex
        k *= 2
    # + row ladder over the 8 groups
    gp = ex[:, LANES - 1:LANES]                   # [8,1] group totals incl
    gpe = _shift_rows(gp, 1, ident)
    k = 1
    while k < rows // LANES:
        gpe = _shift_rows(gpe, k, ident) + gpe
        k *= 2
    ex = ex + gpe                                 # [8,128] exclusive prefix
    # broadcast ex[g, l] to all lanes of row g*128+l: transpose each tile
    exb = jnp.broadcast_to(ex[:, None, :], (rows // LANES, LANES, LANES))
    exb = jnp.swapaxes(exb, 1, 2)                 # tile[g][l, :] = ex[g, l]
    out = v + exb.reshape(rows, LANES) + carry[0]
    carry[0] = carry[0] + ex[ex.shape[0] - 1, LANES - 1] + \
        rs[rs.shape[0] - 1, LANES - 1]
    o_ref[:, :] = out


def ladder_kernel(x_ref, o_ref, carry):
    @pl.when(pl.program_id(0) == 0)
    def _():
        carry[0] = jnp.float32(0)
    v = x_ref[:, :]
    sv, _, (bv, _) = _block_scan(v, None, jnp.add, jnp.float32(0), False)
    o_ref[:, :] = sv + carry[0]
    carry[0] = carry[0] + bv


def main():
    n = 1 << 25
    x = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)
    x2 = x.reshape(-1, LANES)
    grid = x2.shape[0] // _ROWS
    spec = pl.BlockSpec((_ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def run(kern):
        def f(x2):
            return pl.pallas_call(
                kern, grid=(grid,), in_specs=[spec], out_specs=spec,
                out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.float32),
                scratch_shapes=[pltpu.SMEM((1,), jnp.float32)])(x2)
        return f

    ref = np.cumsum(np.asarray(x, np.float64))
    a = np.asarray(run(ladder_kernel)(x2)).ravel()
    b = np.asarray(run(packed_kernel)(x2)).ravel()
    print("err ladder", np.abs(a - ref).max(), " packed",
          np.abs(b - ref).max(), flush=True)
    bench("scan f32 2^25 current ladder", run(ladder_kernel), x2, n * 8)
    bench("scan f32 2^25 packed-row ladder", run(packed_kernel), x2, n * 8)

    # pure copy ceiling at two block sizes
    def copy_kernel(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] * 2.0

    for brows in (1024, 4096):
        g2 = x2.shape[0] // brows
        sp = pl.BlockSpec((brows, LANES), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)

        def cp(x2, sp=sp, g2=g2):
            return pl.pallas_call(
                copy_kernel, grid=(g2,), in_specs=[sp], out_specs=sp,
                out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.float32))(x2)
        bench(f"pure copy*2 blocks={brows}r", cp, x2, n * 8)


if __name__ == "__main__":
    main()
