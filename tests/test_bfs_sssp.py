"""End-to-end BFS/SSSP vs CPU references (reference parity: the examples'
util::compare harness and the CI chesapeake smoke test,
.github/workflows/ubuntu.yml:78-82)."""

import numpy as np
import pytest

from essentials_tpu.algorithms import bfs, sssp
from essentials_tpu.graph import build_graph
from essentials_tpu.io import generate
from essentials_tpu.formats import Csr
from essentials_tpu.utils import compare


def test_bfs_sample(sample_graph):
    res = bfs.run(sample_graph, 2, warmup=False)
    np.testing.assert_array_equal(np.asarray(res.distances),
                                  [bfs.UNREACHED, 1, 0, 1])
    p = np.asarray(res.predecessors)
    assert p[1] == 2 and p[3] == 2 and p[2] == -1


def test_bfs_chesapeake(chesapeake, chesapeake_csr):
    res = bfs.run(chesapeake, 0, warmup=False)
    ref = bfs.cpu_reference(chesapeake_csr, 0)
    assert compare(res.distances, ref) == 0
    assert res.iterations >= 2


def test_bfs_chain_depth():
    csr = Csr.from_coo(generate.chain(50))
    g = build_graph(csr, directed=False, weighted=False)
    res = bfs.run(g, 0, warmup=False)
    assert int(np.asarray(res.distances)[49]) == 49
    assert res.iterations == 50  # 49 productive + 1 empty-detect


def test_bfs_predecessor_validity(chesapeake, chesapeake_csr):
    """Any reported predecessor must be an actual in-neighbor one level up."""
    res = bfs.run(chesapeake, 5, warmup=False)
    dist = np.asarray(res.distances)
    pred = np.asarray(res.predecessors)
    off = np.asarray(chesapeake_csr.row_offsets)
    cols = np.asarray(chesapeake_csr.col_indices)
    for v in range(chesapeake.n_vertices):
        if pred[v] >= 0:
            assert dist[pred[v]] == dist[v] - 1
            assert v in cols[off[pred[v]]:off[pred[v] + 1]]


def test_sssp_sample(sample_graph):
    res = sssp.run(sample_graph, 2, warmup=False)
    d = np.asarray(res.distances)
    np.testing.assert_allclose(d[[1, 2, 3]], [8.0, 0.0, 5.0])
    assert np.isinf(d[0])


def test_sssp_chesapeake_weighted():
    coo = generate.uniform_random(150, 4, seed=11, undirected=True, weighted=True)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=True)
    res = sssp.run(g, 3, warmup=False)
    ref = sssp.cpu_reference(csr, 3)
    assert compare(res.distances, ref) == 0


@pytest.mark.parametrize("source", [0, 17])
def test_sssp_chesapeake_unweighted(chesapeake, chesapeake_csr, source):
    res = sssp.run(chesapeake, source, warmup=False)
    ref = sssp.cpu_reference(chesapeake_csr, source)
    assert compare(res.distances, ref) == 0
