"""Algorithms on a router-enabled graph (the TPU hot path) vs CPU refs.

On CPU backends the router is off by default; forcing build_router=True
exercises the full Benes-routed expand/route/combine pipeline that TPU
runs, against the same references as the default path.
"""

import numpy as np
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
