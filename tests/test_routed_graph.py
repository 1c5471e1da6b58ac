"""Algorithms on a router-enabled graph (the TPU hot path) vs CPU refs.

On CPU backends the router is off by default; forcing build_router=True
exercises the full Benes-routed expand/route/combine pipeline that TPU
runs, against the same references as the default path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import essentials_tpu as et
from essentials_tpu.io import load_graph_file
from essentials_tpu.algorithms import bfs, sssp, pr, spmv
from essentials_tpu.utils import compare


@pytest.fixture(scope="module")
def graph_and_csr():
    csr = load_graph_file("datasets/chesapeake.mtx", cache=False)
    g = et.build_graph(csr, directed=False, weighted=False,
                       build_router=True)
    return g, csr


def test_bfs_routed(graph_and_csr):
    g, csr = graph_and_csr
    r = bfs.run(g, 0)
    assert compare(r.distances, bfs.cpu_reference(csr, 0)) == 0


def test_sssp_routed(graph_and_csr):
    g, csr = graph_and_csr
    r = sssp.run(g, 0)
    assert compare(r.distances, sssp.cpu_reference(csr, 0)) == 0


def test_pr_routed(graph_and_csr):
    g, csr = graph_and_csr
    r = pr.run(g)
    want = pr.cpu_reference(csr)
    np.testing.assert_allclose(np.asarray(r.ranks)[:csr.n_rows], want,
                               rtol=1e-3, atol=1e-5)


def test_spmv_routed(graph_and_csr):
    g, csr = graph_and_csr
    x = np.random.default_rng(0).standard_normal(csr.n_cols).astype(np.float32)
    y = spmv.run(g, x)
    want = spmv.cpu_reference(csr, x)
    np.testing.assert_allclose(np.asarray(y.y)[:csr.n_rows], want,
                               rtol=1e-4, atol=1e-4)


def test_spmv_fused_chain():
    """Fused 7-kernel SpMV chain (ops/fused_spmv.py) vs host reference on
    a cube-routed graph (reference algebra on CPU — same stage order the
    TPU kernels execute)."""
    from essentials_tpu.io import generate
    from essentials_tpu.formats import Csr
    coo = generate.rmat(12, 16, seed=7, undirected=True, weighted=True)
    csr = Csr.from_coo(coo)
    g = et.build_graph(csr, directed=False, weighted=True,
                       build_router=True)
    assert spmv.fused_supported(g), "expected cube routes at this size"
    x = np.random.default_rng(1).standard_normal(
        g.n_vertices_padded).astype(np.float32)
    y = spmv.run(g, jnp.asarray(x), variant="fused", warmup=False)
    want = spmv.cpu_reference(csr, x[:csr.n_rows])
    np.testing.assert_allclose(np.asarray(y.y)[:csr.n_rows], want,
                               rtol=1e-4, atol=1e-4)
    # and the pull path agrees with the fused path bit-for-bit class
    y2 = spmv.run(g, jnp.asarray(x), variant="pull", warmup=False)
    np.testing.assert_allclose(np.asarray(y.y), np.asarray(y2.y),
                               rtol=1e-5, atol=1e-5)
