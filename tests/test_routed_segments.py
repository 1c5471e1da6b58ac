"""Routed offsets engine vs the plain segment engine (CPU backend)."""

import numpy as np
import jax.numpy as jnp
import pytest

from essentials_tpu.ops.configs import Combine
from essentials_tpu.ops.permute import apply_plan, route_permutation, invert_plan
from essentials_tpu.ops.segment import (
    build_offsets_route, combine_by_offsets, combine_by_offsets_routed,
    expand_vertex_to_edges, expand_vertex_to_edges_routed,
    expand_multi_routed)


def _random_offsets(rng, n_seg, ep, empty_frac=0.3):
    """Offsets with empty segments sprinkled in, covering [0, ep]."""
    deg = rng.integers(0, 8, n_seg)
    deg[rng.random(n_seg) < empty_frac] = 0
    total = deg.sum()
    if total > ep:
        deg = (deg * ep) // max(total, 1)
    off = np.zeros(n_seg + 1, np.int64)
    np.cumsum(deg, out=off[1:])
    # stretch the last nonempty segment to fill ep? no — leave tail slack
    return off


def test_invert_plan_roundtrip():
    rng = np.random.default_rng(0)
    n = 5000
    perm = rng.permutation(n).astype(np.int64)
    plan = route_permutation(perm)
    inv = invert_plan(plan)
    x = jnp.asarray(rng.integers(0, 1 << 30, plan.length).astype(np.int32))
    y = apply_plan(x, plan)
    back = apply_plan(y, inv)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("seed", [1, 2])
@pytest.mark.parametrize("dtype", [np.int32, np.float32, np.bool_])
def test_expand_routed_matches(seed, dtype):
    rng = np.random.default_rng(seed)
    n_seg, ep = 700, 4000
    off = _random_offsets(rng, n_seg, ep)
    route = build_offsets_route(off, ep)
    if dtype == np.bool_:
        vals = rng.random(n_seg) < 0.4
    elif dtype == np.float32:
        vals = rng.standard_normal(n_seg).astype(np.float32)
    else:
        vals = rng.integers(-2**31, 2**31, n_seg, dtype=np.int64
                            ).astype(np.int32)
    vj = jnp.asarray(vals)
    offj = jnp.asarray(off)
    want = np.asarray(expand_vertex_to_edges(vj, offj, ep))
    got = np.asarray(expand_vertex_to_edges_routed(vj, route))
    np.testing.assert_array_equal(got, want)


def test_expand_multi_routed():
    rng = np.random.default_rng(7)
    n_seg, ep = 300, 2000
    off = _random_offsets(rng, n_seg, ep)
    route = build_offsets_route(off, ep)
    a = jnp.asarray(rng.integers(0, 100, n_seg).astype(np.int32))
    b = jnp.asarray(rng.standard_normal(n_seg).astype(np.float32))
    ga, gb = expand_multi_routed((a, b), route)
    offj = jnp.asarray(off)
    np.testing.assert_array_equal(
        np.asarray(ga), np.asarray(expand_vertex_to_edges(a, offj, ep)))
    np.testing.assert_array_equal(
        np.asarray(gb), np.asarray(expand_vertex_to_edges(b, offj, ep)))


@pytest.mark.parametrize("combine", [Combine.SUM, Combine.OR, Combine.AND,
                                     Combine.MIN, Combine.MAX])
def test_combine_routed_matches(combine):
    rng = np.random.default_rng(abs(hash(str(combine))) % 2**32)
    n_seg, ep = 600, 5000
    off = _random_offsets(rng, n_seg, ep)
    route = build_offsets_route(off, ep)
    offj = jnp.asarray(off)
    seg_flags = np.zeros(ep, bool)
    starts = off[:-1][np.diff(off) > 0]
    seg_flags[starts] = True
    fl = jnp.asarray(seg_flags)
    if combine in (Combine.OR, Combine.AND):
        ev = jnp.asarray(rng.random(ep) < 0.5)
    else:
        ev = jnp.asarray(rng.integers(-1000, 1000, ep).astype(np.int32))
    want = np.asarray(combine_by_offsets(ev, offj, combine, fl))
    got = np.asarray(combine_by_offsets_routed(ev, route, combine, fl))
    np.testing.assert_array_equal(got, want)


def test_combine_routed_float_sum():
    rng = np.random.default_rng(11)
    n_seg, ep = 200, 1500
    off = _random_offsets(rng, n_seg, ep)
    route = build_offsets_route(off, ep)
    ev = jnp.asarray(rng.standard_normal(ep).astype(np.float32))
    want = np.asarray(combine_by_offsets(ev, jnp.asarray(off), Combine.SUM))
    got = np.asarray(combine_by_offsets_routed(ev, route, Combine.SUM))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # segmented-scan variant (the accurate path used when flags exist):
    # compare against a float64 per-segment reference
    seg_flags = np.zeros(ep, bool)
    seg_flags[off[:-1][np.diff(off) > 0]] = True
    got2 = np.asarray(combine_by_offsets_routed(
        ev, route, Combine.SUM, jnp.asarray(seg_flags)))
    evn = np.asarray(ev, np.float64)
    ref = np.asarray([evn[off[i]:off[i + 1]].sum() for i in range(n_seg)],
                     np.float32)
    np.testing.assert_allclose(got2, ref, rtol=1e-5, atol=1e-5)
