"""Byte-SWAR packed scan helpers (interpret-mode Pallas on any backend)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from essentials_tpu.ops import swar

LANES = 128
R = 16          # packed rows per block -> 4R flat rows per block


def _pack_np(flat):
    """numpy reference pack: flat [G*4R*128] -> [G, R, 128] int32 words."""
    g = flat.reshape(-1, 4, R, LANES).astype(np.int64)
    return (g[:, 0] | (g[:, 1] << 8) | (g[:, 2] << 16) | (g[:, 3] << 24)) \
        .astype(np.uint32).view(np.int32)


def _unpack_np(words):
    w = words.view(np.uint32).astype(np.int64)
    out = np.stack([(w >> (8 * b)) & 0xFF for b in range(4)], axis=1)
    return out.reshape(-1)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, size=(4 * R, LANES), dtype=np.int64) \
        .astype(np.int32)

    def k(x_ref, o_ref, o2_ref):
        p = swar.pack4(x_ref[...])
        o_ref[...] = p
        o2_ref[...] = swar.unpack4(p)

    p, u = pl.pallas_call(
        k, out_shape=[jax.ShapeDtypeStruct((R, LANES), jnp.int32),
                      jax.ShapeDtypeStruct((4 * R, LANES), jnp.int32)],
        interpret=True)(x)
    assert np.array_equal(np.asarray(u), x)
    assert np.array_equal(np.asarray(p),
                          _pack_np(x.reshape(-1)).reshape(R, LANES))


def test_eq_ge_bytes():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 128, size=(R, LANES), dtype=np.int64)
    words = _pack_np(np.concatenate([x.reshape(-1)] * 4)[:4 * R * LANES]) \
        .reshape(-1, LANES)[:R]
    for v in (0, 1, 5, 126, 127):
        def k(x_ref, o_ref, o2_ref):
            o_ref[...] = swar.eq_bytes(x_ref[...], v)
            o2_ref[...] = swar.ge_bytes_const(x_ref[...], max(v, 1))
        eq, ge = pl.pallas_call(
            k, out_shape=[jax.ShapeDtypeStruct((R, LANES), jnp.int32)] * 2,
            interpret=True)(jnp.asarray(words))
        bytes_ = _unpack_np(np.asarray(words))
        assert np.array_equal(_unpack_np(np.asarray(eq)),
                              (bytes_ == v).astype(np.int64)), v
        assert np.array_equal(_unpack_np(np.asarray(ge)),
                              (bytes_ >= max(v, 1)).astype(np.int64)), v


def _run_blocks(kernel_fn, packed_inputs, n_scratch=1):
    """Run a grid of blocks over [G, R, 128] packed inputs with SMEM
    carries, ascending or descending order inside kernel_fn."""
    G = packed_inputs[0].shape[0]
    spec = pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel_fn, grid=(G,),
        in_specs=[spec] * len(packed_inputs),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(packed_inputs[0].shape, jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)] * n_scratch,
        interpret=True)(*packed_inputs)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fill_from_starts(seed):
    rng = np.random.default_rng(seed)
    G = 3
    n = G * 4 * R * LANES
    flags = (rng.random(n) < 0.05).astype(np.int64)
    flags[0] = 1
    vals = rng.integers(0, 127, size=n)
    # numpy reference: forward fill from starts
    ref = np.zeros(n, np.int64)
    cur = 0
    for i in range(n):
        if flags[i]:
            cur = vals[i]
        ref[i] = cur

    vp = jnp.asarray(_pack_np(vals).reshape(G, R, LANES))
    fp = jnp.asarray(_pack_np(flags).reshape(G, R, LANES))

    def k(v_ref, f_ref, o_ref, carry):
        @pl.when(pl.program_id(0) == 0)
        def _():
            carry[0] = jnp.int32(0)
        fill, nc = swar.fill_from_starts(v_ref[0], f_ref[0],
                                         carry[0])
        o_ref[0] = fill
        carry[0] = nc[0, 0]

    out = _run_blocks(k, [vp, fp])
    got = _unpack_np(np.asarray(out))
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_suffix_or(seed):
    rng = np.random.default_rng(seed + 10)
    G = 3
    n = G * 4 * R * LANES
    starts = (rng.random(n) < 0.04).astype(np.int64)
    starts[0] = 1
    z = (rng.random(n) < 0.1).astype(np.int64)
    # reference: per segment OR broadcast over suffix
    ends = np.zeros(n, np.int64)
    ends[:-1] = starts[1:]
    ends[-1] = 1
    ref = np.zeros(n, np.int64)
    acc = 0
    for i in range(n - 1, -1, -1):
        acc = acc | z[i]
        ref[i] = acc
        if starts[i]:
            acc = 0

    zp = jnp.asarray(_pack_np(z).reshape(G, R, LANES))
    sp = jnp.asarray(_pack_np(starts).reshape(G, R, LANES))

    def k(z_ref, s_ref, o_ref, carry_v, carry_s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry_v[0] = jnp.int32(0)
            carry_s[0] = jnp.int32(1)
        end, ncs = swar.end_flags(s_ref[0], carry_s[0], R)
        s, ncv = swar.suffix_or(z_ref[0], end, carry_v[0])
        o_ref[0] = s
        carry_v[0] = ncv[0, 0]
        carry_s[0] = ncs[0, 0]

    G_ = zp.shape[0]
    spec_rev = pl.BlockSpec((1, R, LANES), lambda i: (G_ - 1 - i, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        lambda z_ref, s_ref, o_ref, cv, cs: k(z_ref, s_ref, o_ref, cv, cs),
        grid=(G_,),
        in_specs=[spec_rev, spec_rev],
        out_specs=spec_rev,
        out_shape=jax.ShapeDtypeStruct(zp.shape, jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)] * 2,
        interpret=True)(zp, sp)
    got = _unpack_np(np.asarray(out))
    assert np.array_equal(got, ref)
