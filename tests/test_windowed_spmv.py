"""Windowed 3-kernel SpMV: plan construction + stage-exact reference
algebra vs the host SpMV reference (the TPU kernels execute the same
algebra; see docs/windowed_spmv_design.md)."""

import numpy as np
import pytest
import jax.numpy as jnp

import essentials_tpu as et
from essentials_tpu.formats import Csr
from essentials_tpu.io import generate
from essentials_tpu.algorithms import spmv
from essentials_tpu.ops import windowed_spmv as W


@pytest.mark.parametrize("directed", [True, False])
def test_windowed_plan_ref_matches_host(directed):
    coo = generate.rmat(12, 16, seed=7, undirected=not directed,
                        weighted=True)
    csr = Csr.from_coo(coo)
    g = et.build_graph(csr, directed=directed, weighted=True,
                       build_router=True)
    plan = W.build_windowed_plan(g)
    assert plan is not None, "expected windowed support at this size"
    x = np.random.default_rng(1).standard_normal(
        g.n_vertices_padded).astype(np.float32)
    y = np.asarray(W.spmv_windowed_ref(g, plan, jnp.asarray(x)))
    want = spmv.cpu_reference(csr, x[:csr.n_rows])
    np.testing.assert_allclose(y[:csr.n_rows], want, rtol=1e-4, atol=1e-4)


def test_windowed_multislab():
    """Multi-slab coverage (the rmat12 case builds a single slab, which
    masked a window-base selection bug at rmat20)."""
    coo = generate.rmat(14, 16, seed=3, undirected=False, weighted=True)
    csr = Csr.from_coo(coo)
    g = et.build_graph(csr, directed=True, weighted=True,
                       build_router=True)
    plan = W.build_windowed_plan(g)
    assert plan is not None and plan.G > 1, (plan and plan.G)
    x = np.random.default_rng(2).standard_normal(
        g.n_vertices_padded).astype(np.float32)
    y = np.asarray(W.spmv_windowed_ref(g, plan, jnp.asarray(x)))
    want = spmv.cpu_reference(csr, x[:csr.n_rows])
    np.testing.assert_allclose(y[:csr.n_rows], want, rtol=1e-4, atol=1e-4)
