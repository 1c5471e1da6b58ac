"""Per-piece timings of the cube-route chain at rmat20 scale (tfbc) and
flagship scale (wbc), plus VPU-ladder vs MXU-matmul scan microbenches.

Grounds the round-4 kernel-efficiency work: which of DMA / middle-stage
selects / scan ladders dominates each kernel. Run alone (single-client
TPU runtime).
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 16


def bench(name, fn, *args, n_bytes_model=None, cycles=3):
    @partial(jax.jit, static_argnums=(0,))
    def replay(n, *a):
        def body(i, x):
            out = fn(*((x,) + a[1:]))
            return out if isinstance(out, jax.Array) and \
                out.shape == x.shape and out.dtype == x.dtype \
                else x + jnp.asarray(out, x.dtype).ravel()[0] * 0
        out = jax.lax.fori_loop(0, n, body, a[0])
        return jnp.sum(out.ravel()[:8].astype(jnp.float32))

    def fetch(n):
        t = time.perf_counter()
        float(replay(n, *args))
        return time.perf_counter() - t

    t0 = time.perf_counter()
    fetch(1)
    compile_s = time.perf_counter() - t0
    fetch(R)
    best = float("inf")
    for _ in range(cycles):
        d1 = fetch(1)
        dR = fetch(R)
        best = min(best, max((dR - d1) / (R - 1), 1e-9))
    ms = best * 1e3
    extra = ""
    if n_bytes_model:
        extra = f"  ({n_bytes_model / best / 1e9:7.1f} GB/s-model)"
    print(f"{name:40s} {ms:9.3f} ms{extra}   [compile {compile_s:.0f}s]",
          flush=True)
    return ms


def scan_micro():
    """[R,128]-block inclusive scan: VPU ladder vs MXU triangular matmul."""
    from essentials_tpu.ops.scan_kernels import _block_scan, _ROWS, LANES

    n = 1 << 25
    x = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)
    x2 = x.reshape(-1, LANES)
    rows = x2.shape[0]
    brows = _ROWS
    grid = rows // brows

    spec = pl.BlockSpec((brows, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def ladder_kernel(x_ref, o_ref, carry):
        @pl.when(pl.program_id(0) == 0)
        def _():
            carry[0] = jnp.float32(0)
        v = x_ref[:, :]
        sv, _, (bv, _) = _block_scan(v, None, jnp.add, jnp.float32(0), False)
        o_ref[:, :] = sv + carry[0]
        carry[0] = carry[0] + bv

    def mxu_kernel(x_ref, tri_ref, tril_ref, o_ref, carry):
        # lane scan: x @ U (upper-triangular ones) gives inclusive prefix
        # along lanes; exclusive row prefix via a strict-lower-triangular
        # matmul over the row totals.
        @pl.when(pl.program_id(0) == 0)
        def _():
            carry[0] = jnp.float32(0)
        v = x_ref[:, :]
        tri = tri_ref[:, :]
        lane_incl = jax.lax.dot_general(
            v, tri, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        row_tot = lane_incl[:, LANES - 1:LANES]             # [R, 1]
        row_excl = jax.lax.dot_general(
            tril_ref[:, :], row_tot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [R, 1]
        o_ref[:, :] = lane_incl + row_excl + carry[0]
        carry[0] = carry[0] + row_excl[row_excl.shape[0] - 1, 0] + \
            row_tot[row_tot.shape[0] - 1, 0]

    tri = jnp.triu(jnp.ones((LANES, LANES), jnp.float32))
    tril = jnp.tril(jnp.ones((brows, brows), jnp.float32), -1)

    def run_ladder(x2):
        return pl.pallas_call(
            ladder_kernel, grid=(grid,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.float32),
            scratch_shapes=[pltpu.SMEM((1,), jnp.float32)])(x2)

    tri_spec = pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    tril_spec = pl.BlockSpec((brows, brows), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)

    def run_mxu(x2):
        return pl.pallas_call(
            mxu_kernel, grid=(grid,), in_specs=[spec, tri_spec, tril_spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.float32),
            scratch_shapes=[pltpu.SMEM((1,), jnp.float32)])(x2, tri, tril)

    a = np.asarray(run_ladder(x2)).ravel()
    b = np.asarray(run_mxu(x2)).ravel()
    c = np.cumsum(np.asarray(x, np.float64))
    print(f"scan check: ladder err {np.abs(a - c).max():.3e}  "
          f"mxu err {np.abs(b - c).max():.3e}", flush=True)
    bench("block scan f32 2^25: VPU ladder", run_ladder, x2,
          n_bytes_model=n * 8)
    bench("block scan f32 2^25: MXU triangular", run_mxu, x2,
          n_bytes_model=n * 8)


def copy_ceiling():
    """Practical streaming ceiling: pure copy*2 at two block sizes.
    Measured v5e (2026-08, axon pool): 341-373 GB/s-model — the number
    every per-kernel GB/s figure here should be judged against, NOT the
    819 GB/s HBM spec."""
    n = 1 << 25
    x2 = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32) \
        .reshape(-1, LANES_)

    def copy_kernel(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] * 2.0

    for brows in (1024, 4096):
        g2 = x2.shape[0] // brows
        sp = pl.BlockSpec((brows, LANES_), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)

        def cp(x2, sp=sp, g2=g2):
            return pl.pallas_call(
                copy_kernel, grid=(g2,), in_specs=[sp], out_specs=sp,
                out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.float32))(x2)
        bench(f"pure copy*2 blocks={brows}r", cp, x2, n_bytes_model=n * 8)


LANES_ = 128


def main():
    from essentials_tpu.formats import Csr
    from essentials_tpu.graph import build_graph
    from essentials_tpu.io import generate
    from essentials_tpu.ops.cube_router import (apply_cube_plan,
                                                apply_cube_chain)
    from essentials_tpu.ops.permute import apply_plan

    copy_ceiling()
    scan_micro()

    for scale, ef, tag in [(18, 16, "wbc"), (20, 30, "tfbc")]:
        t0 = time.perf_counter()
        coo = generate.rmat(scale, ef, seed=3, undirected=(scale == 18),
                            weighted=False)
        csr = Csr.from_coo(coo)
        g = build_graph(csr, directed=(scale != 18), weighted=False)
        ep = g.n_edges_padded
        plan = g.route_fwd
        L = plan.length
        print(f"== rmat{scale} {tag}: Ep={ep} L={L} form={plan.form} "
              f"wide={plan.wide} ({time.perf_counter() - t0:.0f}s) ==",
              flush=True)
        x = jnp.arange(L, dtype=jnp.int32)

        bench(f"{tag} route 1-payload (3 kernels)",
              lambda v: apply_cube_plan((v,), plan)[0], x,
              n_bytes_model=L * 8 * 3)
        bench(f"{tag} route + post_scan",
              lambda v: apply_cube_plan((v,), plan, post_scan=True)[0], x,
              n_bytes_model=L * 8 * 3)
        bench(f"{tag} chain fwd+bwd (5 kernels)",
              lambda v: apply_cube_chain((v,), plan, g.route_bwd)[0], x,
              n_bytes_model=L * 8 * 5)
        del g
    print("done", flush=True)


if __name__ == "__main__":
    main()
