"""Piece attribution of the windowed SpMV at rmat20: time cumulative
prefixes of the pipeline (x-prep / K1w / K2 / K3w / DUS merge / y-route)
with output-feedback replay."""

import time
from functools import partial
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

R = 12


def main():
    from benchmarks.run_benchmarks import _load
    from essentials_tpu.graph import build_graph
    from essentials_tpu import algorithms as A
    from essentials_tpu.ops import windowed_spmv as W
    from essentials_tpu.ops.cube_router import _plan_kparts, _MSLAB
    from essentials_tpu.ops.permute import apply_plan
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = sys.argv[1] if len(sys.argv) > 1 else "gen:rmat20x16"
    csr, ds = _load(spec)
    g = build_graph(csr, directed=False, weighted=True)
    plan = A.pr.spmv_plan(g)
    assert plan is not None
    LANES, SLAB = W.LANES, W.SLAB
    L, G = plan.L, plan.G
    print(f"{ds}: G={G} n_cseg={plan.n_cseg} n_rseg={plan.n_rseg}",
          flush=True)

    def bs(shp, im):
        return pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)

    i0b, i1b, i6b, k2_kernel, k2_idx = _plan_kparts(g.route_bwd, bs)
    wm = plan.w_csc_l.reshape(G, 8, LANES, LANES)
    fm = plan.flags_l.reshape(G, 8, LANES, LANES)
    vmem = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    def pipeline(x, stage):
        x = x.astype(jnp.float32)
        xc = apply_plan(x, plan.xc_route)
        bits = jax.lax.bitcast_convert_type(xc, jnp.int32)
        dxc = jnp.diff(bits, prepend=jnp.zeros(1, jnp.int32))
        dxc = jnp.where(jnp.arange(dxc.shape[0]) <= plan.n_cseg, dxc, 0)
        need = plan.dxc_pad_rows * LANES
        dxc = dxc[:need] if dxc.shape[0] >= need \
            else jnp.pad(dxc, (0, need - dxc.shape[0]))
        dxc2 = dxc.reshape(-1, LANES)
        if stage == 0:
            return dxc2.ravel()[:g.n_vertices_padded]

        w_specs = [bs((1, 8, LANES, LANES),
                      lambda gi, p, *_: (gi, 0, 0, 0))]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3, grid=(G, 1),
            in_specs=[bs((dxc2.shape[0], LANES),
                         lambda gi, p, *_: (0, 0))]
            + [bs((1,) + tuple(st.shape[1:]),
                  lambda gi, p, *_, nd=st.ndim: (gi,) + (0,) * (nd - 1))
               for st in plan.p_stages] + w_specs
            + [bs((_MSLAB, LANES, LANES), lambda gi, p, *_: (gi, 0, 0)),
               bs((_MSLAB, LANES, LANES), lambda gi, p, *_: (gi, 0, 0))],
            out_specs=bs((1, LANES, _MSLAB, LANES),
                         lambda gi, p, *_: (p, 0, gi, 0)),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        )
        k1 = pl.pallas_call(
            partial(W._k1w_kernel, False), grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, LANES, G * _MSLAB, LANES),
                                           jnp.int32),
            compiler_params=vmem,
        )(plan.row0, plan.win_lo, plan.win_hi, dxc2, *plan.p_stages, wm,
          i0b, i1b)
        if stage == 1:
            return jax.lax.bitcast_convert_type(
                k1, jnp.float32).ravel()[:g.n_vertices_padded]
        M = G * _MSLAB
        k2 = pl.pallas_call(
            k2_kernel, grid=(LANES, 1),
            in_specs=[bs((1, 1, M, LANES), lambda c, p: (p, c, 0, 0))]
            + [spec for _, spec in k2_idx],
            out_specs=bs((1, 1, M, LANES), lambda c, p: (p, c, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, LANES, M, LANES),
                                           jnp.int32),
            compiler_params=vmem,
        )(k1, *[a for a, _ in k2_idx])
        if stage == 2:
            return jax.lax.bitcast_convert_type(
                k2, jnp.float32).ravel()[:g.n_vertices_padded]
        priv = pl.pallas_call(
            partial(W._k3w_kernel), grid=(G, 1),
            in_specs=[bs((1, LANES, _MSLAB, LANES),
                         lambda gi, p: (p, 0, gi, 0)),
                      bs((_MSLAB, LANES, LANES), lambda gi, p: (gi, 0, 0)),
                      bs((1, 8, LANES, LANES),
                         lambda gi, p: (gi, 0, 0, 0))]
            + [bs((1,) + tuple(st.shape[1:]),
                  lambda gi, p, nd=st.ndim: (gi,) + (0,) * (nd - 1))
               for st in plan.q_stages],
            out_specs=bs((1, 8, LANES, LANES), lambda gi, p: (gi, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((G, 8, LANES, LANES),
                                           jnp.int32),
            scratch_shapes=[pltpu.SMEM((1,), jnp.float32),
                            pltpu.SMEM((1,), jnp.int32)],
            compiler_params=vmem,
        )(k2, i6b, fm, *plan.q_stages)
        if stage == 3:
            return jax.lax.bitcast_convert_type(
                priv, jnp.float32).ravel()[:g.n_vertices_padded]
        privf = jax.lax.bitcast_convert_type(priv, jnp.float32) \
            .reshape(G, SLAB)
        yc = jnp.zeros(plan.vp, jnp.float32)
        for s in range(G):
            cb, lo, ln = plan.q_spans[s]
            if ln == 0:
                continue
            yc = jax.lax.dynamic_update_slice(
                yc, jax.lax.slice(privf[s], [lo], [lo + ln]),
                (cb * LANES + lo,))
        if stage == 4:
            return yc[:g.n_vertices_padded]
        y = apply_plan(yc, plan.y_route)
        return jnp.where(plan.y_mask, y, 0.0)[:g.n_vertices_padded]

    x0 = jnp.where(g.vertex_mask(),
                   jax.random.uniform(jax.random.PRNGKey(0),
                                      (g.n_vertices_padded,), jnp.float32),
                   0.0)

    @partial(jax.jit, static_argnums=(2, 3))
    def replay(g, x, n, stage):
        def body(i, x):
            y = pipeline(x, stage)
            if y.shape[0] < x.shape[0]:
                y = jnp.pad(y, (0, x.shape[0] - y.shape[0]))
            return x * 0.5 + y[:x.shape[0]] * 1e-9
        return jnp.sum(jax.lax.fori_loop(0, n, body, x).ravel()[:8])

    def fetch(n, stage):
        t = time.perf_counter()
        float(replay(g, x0, n, stage))
        return time.perf_counter() - t

    names = ["x-prep", "+K1w", "+K2", "+K3w", "+DUSmerge", "+y-route"]
    prev = 0.0
    for stage in range(6):
        fetch(1, stage)
        fetch(R, stage)
        best = min(max((fetch(R, stage) - fetch(1, stage)) / (R - 1), 1e-9)
                   for _ in range(3)) * 1e3
        print(f"{names[stage]:10s}: {best:7.3f} ms  (+{best - prev:6.3f})",
              flush=True)
        prev = best


if __name__ == "__main__":
    main()
