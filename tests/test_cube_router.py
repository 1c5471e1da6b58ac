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
