"""Degree-bucketed dense segment reduction vs jax.ops reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from essentials_tpu.ops.bucketed import build_schedule, bucketed_combine
from essentials_tpu.ops.configs import Combine
from essentials_tpu.ops.segment import segment_combine


def _random_segments(n_seg, n_edges, seed, skew=False):
    rng = np.random.default_rng(seed)
    if skew:
        # power-law-ish: one giant segment + many small
        ids = np.concatenate([np.zeros(n_edges // 2, np.int64),
                              rng.integers(0, n_seg, n_edges - n_edges // 2)])
    else:
        ids = rng.integers(0, n_seg, n_edges)
    ids.sort()
    off = np.zeros(n_seg + 1, np.int64)
    np.cumsum(np.bincount(ids, minlength=n_seg), out=off[1:])
    return ids, off


@pytest.mark.parametrize("combine", [Combine.SUM, Combine.MIN, Combine.MAX,
                                     Combine.OR, Combine.AND])
@pytest.mark.parametrize("skew", [False, True])
def test_matches_segment_ops(combine, skew):
    n_seg, n_edges = 100, 5000
    ids, off = _random_segments(n_seg, n_edges, seed=3, skew=skew)
    sched = build_schedule(off, n_seg, n_edges)
    rng = np.random.default_rng(0)
    if combine in (Combine.OR, Combine.AND):
        vals = jnp.asarray(rng.random(n_edges) < 0.02)
    else:
        vals = jnp.asarray(rng.random(n_edges).astype(np.float32))
    got = bucketed_combine(vals, sched, combine)
    want = segment_combine(vals, jnp.asarray(ids.astype(np.int32)), n_seg,
                           combine, indices_are_sorted=True)
    if combine in (Combine.OR, Combine.AND):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    else:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_empty_segments_get_identity():
    off = np.array([0, 0, 3, 3, 5])
    sched = build_schedule(off, 4, 5)
    vals = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0])
    got = np.asarray(bucketed_combine(vals, sched, Combine.SUM))
    np.testing.assert_allclose(got, [0, 6, 0, 9])
    got_min = np.asarray(bucketed_combine(vals, sched, Combine.MIN))
    assert got_min[0] == np.inf and got_min[1] == 1.0


def test_all_empty():
    off = np.zeros(5, np.int64)
    sched = build_schedule(off, 4, 0)
    vals = jnp.zeros(0, jnp.float32)
    got = np.asarray(bucketed_combine(vals, sched, Combine.SUM))
    np.testing.assert_allclose(got, np.zeros(4))


def test_jit_and_grad_safe():
    ids, off = _random_segments(10, 200, seed=1)
    sched = build_schedule(off, 10, 200)
    vals = jnp.asarray(np.random.default_rng(2).random(200).astype(np.float32))

    @jax.jit
    def f(v, s):
        return jnp.sum(bucketed_combine(v, s, Combine.SUM))

    assert abs(float(f(vals, sched)) - float(vals.sum())) < 1e-3
