"""Cube router v2 tests (CPU: the jnp reference executor mirrors the Pallas
stage algebra exactly, so these validate what the TPU kernels compute)."""

import numpy as np
import jax.numpy as jnp
import pytest

from essentials_tpu.ops.cube_router import (
    build_cube_plan, invert_cube_plan, apply_cube_plan, cube_routable_length,
    _SEG)


@pytest.mark.parametrize("n", [16385, 20000, 49152, 200000, 500001])
def test_cube_wbc_matches_direct(n):
    rng = np.random.default_rng(n)
    perm = rng.permutation(n)
    plan = build_cube_plan(perm)
    assert plan is not None and plan.form == "wbc"
    assert plan.length == cube_routable_length(n)
    assert plan.wide == plan.length // _SEG
    x = jnp.asarray(rng.integers(-10**6, 10**6, n).astype(np.int32))
    (out,) = apply_cube_plan((x,), plan, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[perm])


def test_cube_invert_roundtrip():
    rng = np.random.default_rng(7)
    n = 40000
    perm = rng.permutation(n)
    plan = build_cube_plan(perm)
    inv = invert_cube_plan(plan)
    x = jnp.asarray(rng.random(n).astype(np.float32))
    (y,) = apply_cube_plan((x,), plan, use_pallas=False)
    (back,) = apply_cube_plan((y,), inv, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_cube_multi_payload_mixed_dtypes():
    rng = np.random.default_rng(9)
    n = 30000
    perm = rng.permutation(n)
    plan = build_cube_plan(perm)
    xf = jnp.asarray(rng.random(n).astype(np.float32))
    xi = jnp.asarray(rng.integers(-100, 100, n).astype(np.int32))
    xb = jnp.asarray(rng.random(n) < 0.5)
    x8 = jnp.asarray(rng.integers(0, 100, n).astype(np.int8))
    of, oi, ob, o8 = apply_cube_plan((xf, xi, xb, x8), plan,
                                     use_pallas=False)
    np.testing.assert_array_equal(np.asarray(of), np.asarray(xf)[perm])
    np.testing.assert_array_equal(np.asarray(oi), np.asarray(xi)[perm])
    np.testing.assert_array_equal(np.asarray(ob), np.asarray(xb)[perm])
    np.testing.assert_array_equal(np.asarray(o8), np.asarray(x8)[perm])
    assert of.dtype == jnp.float32 and ob.dtype == jnp.bool_
    assert o8.dtype == jnp.int8


@pytest.mark.slow
def test_cube_tfbc_matches_direct():
    """Exercises the 7-stage [T,F,B,C] form (needs > 8.4M elements)."""
    n = _SEG * 512 + 1
    rng = np.random.default_rng(3)
    perm = rng.permutation(n)
    plan = build_cube_plan(perm)
    assert plan.form == "tfbc"
    x = jnp.asarray(rng.integers(0, 2**31 - 1, n).astype(np.int32))
    (out,) = apply_cube_plan((x,), plan, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[perm])
    inv = invert_cube_plan(plan)
    (back,) = apply_cube_plan((out,), inv, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_apply_cube_chain_n_matches_composition():
    """3-route chain with incl/excl scans == unfused composition."""
    import numpy as np
    import jax.numpy as jnp
    from essentials_tpu.ops.cube_router import (build_cube_plan,
                                                apply_cube_plan,
                                                apply_cube_chain_n,
                                                chainable_n)
    rng = np.random.default_rng(11)
    n = 3 * 16384 * 8 + 5
    from essentials_tpu.ops.cube_router import cube_routable_length
    L = cube_routable_length(n)
    plans = [build_cube_plan(rng.permutation(L))
             for _ in range(3)]
    assert chainable_n(plans)
    x = jnp.asarray(rng.integers(-50, 50, n).astype(np.int32))

    got = apply_cube_chain_n((x,), plans, ["incl", "excl"])[0]

    v = jnp.pad(x, (0, L - n))
    v = apply_cube_plan((v,), plans[0])[0]
    v = jnp.cumsum(v)
    v = apply_cube_plan((v,), plans[1])[0]
    v = jnp.cumsum(v) - v
    v = apply_cube_plan((v,), plans[2])[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(v[:n]))


def test_advance_count_matches_generic():
    import numpy as np
    import jax.numpy as jnp
    from essentials_tpu.graph import build_graph
    from essentials_tpu.io import generate
    from essentials_tpu.formats import Csr
    from essentials_tpu.ops import advance, advance_count, Combine
    coo = generate.rmat(10, 8, seed=3, undirected=True, weighted=False)
    g = build_graph(Csr.from_coo(coo), directed=False, weighted=False)
    rng = np.random.default_rng(4)
    f = jnp.asarray(rng.random(g.n_vertices_padded) < 0.3)
    f = f & (jnp.arange(g.n_vertices_padded) < g.n_vertices)
    want = advance(g, lambda e: True, f, combine=Combine.OR,
                   with_frontier=False)
    got = advance_count(g, f)
    np.testing.assert_array_equal(np.asarray(got > 0), np.asarray(want))
