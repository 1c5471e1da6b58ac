"""Benes/Clos router tests (CPU: XLA take_along_axis backend; same plan
arrays drive the Pallas path on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from essentials_tpu.ops.permute import (route_permutation, apply_plan,
                                        apply_plan_multi, edge_color,
                                        plan_length)


def test_edge_color_proper():
    rng = np.random.default_rng(1)
    R, D = 37, 16
    u = np.repeat(np.arange(R), D).astype(np.int32)
    v = np.repeat(np.arange(R), D)[rng.permutation(R * D)].astype(np.int32)
    c = edge_color(u, v, R, D)
    for r in range(R):
        assert len(set(c[u == r].tolist())) == D
        assert len(set(c[v == r].tolist())) == D


@pytest.mark.parametrize("n", [1, 128, 200, 4096, 16384, 20000, 70000])
def test_route_apply(n):
    rng = np.random.default_rng(n)
    perm = rng.permutation(n)
    plan = route_permutation(perm)
    assert plan.length == plan_length(n)
    x = jnp.asarray(rng.random(n).astype(np.float32))
    out = np.asarray(apply_plan(x, plan, use_pallas=False))
    np.testing.assert_array_equal(out, np.asarray(x)[perm])


def test_multi_payload_dtypes():
    rng = np.random.default_rng(0)
    n = 5000
    perm = rng.permutation(n)
    plan = route_permutation(perm)
    xf = jnp.asarray(rng.random(n).astype(np.float32))
    xi = jnp.asarray(rng.integers(-100, 100, n).astype(np.int32))
    xb = jnp.asarray(rng.random(n) < 0.5)
    x8 = jnp.asarray(rng.integers(0, 100, n).astype(np.int8))
    of, oi, ob, o8 = apply_plan_multi((xf, xi, xb, x8), plan,
                                      use_pallas=False)
    np.testing.assert_array_equal(np.asarray(of), np.asarray(xf)[perm])
    np.testing.assert_array_equal(np.asarray(oi), np.asarray(xi)[perm])
    np.testing.assert_array_equal(np.asarray(ob), np.asarray(xb)[perm])
    np.testing.assert_array_equal(np.asarray(o8), np.asarray(x8)[perm])
    assert of.dtype == jnp.float32 and ob.dtype == jnp.bool_


def test_plan_is_jittable():
    rng = np.random.default_rng(3)
    n = 1000
    perm = rng.permutation(n)
    plan = route_permutation(perm)
    x = jnp.asarray(rng.random(n).astype(np.float32))

    @jax.jit
    def f(x, plan):
        return apply_plan(x, plan, use_pallas=False)

    np.testing.assert_array_equal(np.asarray(f(x, plan)),
                                  np.asarray(x)[perm])


def test_graph_with_router_matches_without(chesapeake_csr):
    """Same algorithm results with and without the router engaged."""
    from essentials_tpu.graph import build_graph
    from essentials_tpu.algorithms import bfs, sssp
    g0 = build_graph(chesapeake_csr, directed=False, weighted=False,
                     build_router=False)
    g1 = build_graph(chesapeake_csr, directed=False, weighted=False,
                     build_router=True)
    r0 = bfs.run(g0, 0, warmup=False)
    r1 = bfs.run(g1, 0, warmup=False)
    np.testing.assert_array_equal(np.asarray(r0.distances),
                                  np.asarray(r1.distances))
    s0 = sssp.run(g0, 3, warmup=False)
    s1 = sssp.run(g1, 3, warmup=False)
    np.testing.assert_array_equal(np.asarray(s0.distances),
                                  np.asarray(s1.distances))
