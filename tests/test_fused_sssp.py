"""Edge-axis fused SSSP (pure-XLA reference superstep on CPU)."""

import numpy as np
import pytest

from essentials_tpu.algorithms import sssp
from essentials_tpu.formats import Csr
from essentials_tpu.graph import build_graph
from essentials_tpu.io import generate


@pytest.fixture(scope="module")
def g_rmat_w():
    coo = generate.rmat(10, 8, seed=4, undirected=True, weighted=True)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=True, build_router=True)
    return csr, g


def test_fused_sssp_matches_dijkstra(g_rmat_w):
    csr, g = g_rmat_w
    assert sssp.fused_supported(g)
    for src in (0, 5, 100):
        res = sssp.run(g, src, warmup=False, variant="fused")
        ref = sssp.cpu_reference(csr, src)
        got = np.asarray(res.distances)
        finite = np.isfinite(ref)
        assert np.array_equal(np.isfinite(got), finite), src
        # f32 MIN-combine distances are deterministic; compare tight
        np.testing.assert_allclose(got[finite], ref[finite],
                                   rtol=1e-5, atol=1e-5)


def test_fused_sssp_predecessors_consistent(g_rmat_w):
    csr, g = g_rmat_w
    res = sssp.run(g, 0, warmup=False, variant="fused")
    dist = np.asarray(res.distances)
    pred = np.asarray(res.predecessors)
    offs = np.asarray(csr.row_offsets)
    cols = np.asarray(csr.col_indices)
    vals = np.asarray(csr.values)
    for v in range(g.n_vertices):
        if v == 0 or not np.isfinite(dist[v]):
            assert pred[v] == -1
            continue
        u = pred[v]
        assert u >= 0
        # the predecessor edge achieves the distance exactly (f32)
        es = [e for e in range(offs[u], offs[u + 1]) if cols[e] == v]
        assert es, (u, v)
        assert any(np.float32(dist[u]) + np.float32(vals[e])
                   == np.float32(dist[v]) for e in es)


def test_fused_sssp_grid():
    coo = generate.grid_2d(16, weighted=True)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=True, build_router=True)
    res = sssp.run(g, 3, warmup=False, variant="fused")
    ref = sssp.cpu_reference(csr, 3)
    got = np.asarray(res.distances)
    finite = np.isfinite(ref)
    assert np.array_equal(np.isfinite(got), finite)
    np.testing.assert_allclose(got[finite], ref[finite], rtol=1e-5,
                               atol=1e-5)
