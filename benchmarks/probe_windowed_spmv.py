"""Feasibility probe for the windowed-SpMV design: (a) VMEM-resident
full table + per-grid-step dynamic row-window slice (8-row aligned,
offset from a prefetched scalar array); (b) in-kernel [8,128,128]
static permutation via lane-gathers + 8-way select."""
import time
from functools import partial
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 128
Vp = 1 << 20                 # resident table: 1M f32 = 4MB VMEM
N = 1 << 23                  # edge axis 8.4M
SLAB = 8 * L * L             # 131072
G = N // SLAB

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (Vp,), jnp.float32)
x2 = x.reshape(-1, L)                        # [8192, 128]
# per-slab aligned window offsets (8-row aligned)
offs = (jax.random.randint(key, (G,), 0, (Vp - SLAB) // L // 8, jnp.int32)
        * 8)

def kernel(offs_ref, x_ref, o_ref):
    g = pl.program_id(0)
    r0 = pl.multiple_of(offs_ref[g], 8)
    win = x_ref[pl.ds(r0, SLAB // L), :]     # [1024, 128] dynamic window
    o_ref[0] = win * 2.0

grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1,
    grid=(G,),
    in_specs=[pl.BlockSpec((x2.shape[0], L), lambda g, *_: (0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, SLAB // L, L), lambda g, *_: (g, 0, 0),
                           memory_space=pltpu.VMEM),
)
f = jax.jit(lambda offs, x2: pl.pallas_call(
    kernel, grid_spec=grid_spec,
    out_shape=jax.ShapeDtypeStruct((G, SLAB // L, L), jnp.float32))(offs, x2))
out = np.asarray(f(offs, x2))
ref = np.stack([np.asarray(x2)[int(o):int(o) + SLAB // L] * 2
                for o in np.asarray(offs)])
print("window probe exact:", np.array_equal(out, ref), flush=True)

# timing
@partial(jax.jit, static_argnums=(2,))
def replay(offs, x2, n):
    def body(i, acc):
        return acc + f(offs, x2)[0, 0, 0] * 0
    return jax.lax.fori_loop(0, n, body, jnp.float32(0))
def fetch(n):
    t = time.perf_counter(); float(replay(offs, x2, n)); return time.perf_counter()-t
fetch(1); fetch(8)
best = min(max((fetch(8)-fetch(1))/7, 1e-9) for _ in range(3))
print(f"windowed fill of {N/1e6:.0f}M elems: {best*1e3:.2f} ms "
      f"({N*8/best/1e9:.0f} GB/s-model)", flush=True)

# (b) in-kernel 5-stage wbc-style perm on each slab (static idx inputs)
from essentials_tpu.ops.cube_router import build_cube_plan, _ref_apply
perm = np.random.default_rng(0).permutation(SLAB)
plan = build_cube_plan(perm)
print("slab plan form:", plan.form, "wide:", plan.wide, flush=True)
s = [jnp.asarray(a, jnp.int32) for a in plan.stages]

def perm_kernel(x_ref, i0, i1, iw, ib, i4, o_ref):
    from essentials_tpu.ops.cube_router import _g2
    a = x_ref[0].reshape(8, L, L)
    a = _g2(a, i0[...])
    a = jnp.swapaxes(a, 1, 2)
    a = _g2(a, i1[...])
    a = jnp.transpose(a, (1, 2, 0))          # [C, B, W=8]
    # wide stage W=8: select-accumulate
    iww = iw[...]
    acc = jnp.zeros_like(a)
    for t in range(8):
        acc = jnp.where(iww == t, a[:, :, t:t+1], acc)
    a = acc
    a = jnp.swapaxes(a, 1, 2)                # [C, W, B]
    a = _g2(a, ib[...])
    a = jnp.transpose(a, (1, 2, 0))          # [W, B, C]
    a = _g2(a, i4[...])
    o_ref[0] = a.reshape(8, L, L)

xs = jax.random.normal(key, (N,), jnp.float32)
xm = jax.lax.bitcast_convert_type(xs, jnp.int32).reshape(G, 8, L, L)
def bs3(shp, im):
    return pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)
g2 = jax.jit(lambda xm: pl.pallas_call(
    perm_kernel, grid=(G,),
    in_specs=[bs3((1, 8, L, L), lambda g: (g, 0, 0, 0)),
              bs3(tuple(s[0].shape), lambda g: (0,) * s[0].ndim),
              bs3(tuple(s[1].shape), lambda g: (0,) * s[1].ndim),
              bs3(tuple(s[2].shape), lambda g: (0,) * s[2].ndim),
              bs3(tuple(s[3].shape), lambda g: (0,) * s[3].ndim),
              bs3(tuple(s[4].shape), lambda g: (0,) * s[4].ndim)],
    out_specs=bs3((1, 8, L, L), lambda g: (g, 0, 0, 0)),
    out_shape=jax.ShapeDtypeStruct((G, 8, L, L), jnp.int32),
    compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024))(xm, *s))
outp = np.asarray(g2(xm)).reshape(N)
refp = np.stack([np.asarray(_ref_apply(jnp.asarray(
    np.asarray(xm.reshape(G, -1))[gg]), plan)) for gg in range(2)])
ok = np.array_equal(outp.reshape(G, -1)[:2], refp)
print("slab perm exact (2 slabs):", ok, flush=True)
def fetch2(n):
    @partial(jax.jit, static_argnums=(1,))
    def rp(xm, n):
        def body(i, acc):
            return acc + g2(xm)[0, 0, 0, 0] * 0
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))
    t = time.perf_counter(); int(rp(xm, n)); return time.perf_counter()-t
fetch2(1); fetch2(8)
best = min(max((fetch2(8)-fetch2(1))/7, 1e-9) for _ in range(3))
print(f"per-slab perm over {N/1e6:.0f}M: {best*1e3:.2f} ms "
      f"({N*8/best/1e9:.0f} GB/s-model)", flush=True)
