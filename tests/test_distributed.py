"""Multi-device tests on an 8-way virtual CPU mesh (capability the reference
never had: SURVEY.md §2.4 — every reference operator throws on >1 device)."""

import numpy as np
import pytest
import jax

from essentials_tpu.formats import Csr
from essentials_tpu.graph import build_graph
from essentials_tpu.io import generate
from essentials_tpu.parallel import make_mesh
from essentials_tpu.parallel.partition import partition_graph
from essentials_tpu.parallel.distributed import dist_bfs, dist_pagerank
from essentials_tpu.algorithms import bfs
from essentials_tpu.utils import compare


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_partition_shapes(chesapeake_csr):
    dg = partition_graph(chesapeake_csr, 8)
    assert dg.n_devices == 8
    assert dg.src_offsets.shape == (8, dg.n_vertices_global + 1)
    assert dg.dst_offsets.shape == (8, dg.block_size + 2)
    assert dg.weights.shape == (8, dg.edges_per_device)
    # per-device edge counts (before padding) sum to the edge total
    doff = np.asarray(dg.dst_offsets)
    per_dev = doff[:, dg.block_size]  # edges before the trash slot
    assert int(per_dev.sum()) == chesapeake_csr.nnz
    # src offsets are monotone and end at the padded edge count
    soff = np.asarray(dg.src_offsets)
    assert np.all(np.diff(soff, axis=1) >= 0)
    assert np.all(soff[:, -1] == dg.edges_per_device)


def test_dist_bfs_matches_single_device(chesapeake_csr, mesh8):
    dg = partition_graph(chesapeake_csr, 8)
    dist = np.asarray(dist_bfs(dg, mesh8, 0))[:chesapeake_csr.n_rows]
    ref = bfs.cpu_reference(chesapeake_csr, 0)
    assert compare(dist, ref) == 0


def test_dist_bfs_chain(mesh8):
    csr = Csr.from_coo(generate.chain(40))
    dg = partition_graph(csr, 8)
    dist = np.asarray(dist_bfs(dg, mesh8, 0))[:40]
    np.testing.assert_array_equal(dist, np.arange(40))


def test_dist_pagerank_sums_to_one(chesapeake_csr, mesh8):
    dg = partition_graph(chesapeake_csr, 8)
    p = np.asarray(dist_pagerank(dg, mesh8))
    assert abs(p.sum() - 1.0) < 1e-4
    # single-device reference: power iteration in numpy
    n = chesapeake_csr.n_rows
    off = np.asarray(chesapeake_csr.row_offsets)
    cols = np.asarray(chesapeake_csr.col_indices)
    deg = np.diff(off)
    pr = np.full(n, 1.0 / n)
    for _ in range(100):
        contrib = np.where(deg > 0, pr / np.maximum(deg, 1), 0.0)
        nxt = np.zeros(n)
        for u in range(n):
            nxt[cols[off[u]:off[u + 1]]] += contrib[u]
        dangling = pr[deg == 0].sum()
        new = (1 - 0.85) / n + 0.85 * (nxt + dangling / n)
        if np.abs(new - pr).sum() < 1e-6:
            pr = new
            break
        pr = new
    assert compare(p[:n], pr.astype(np.float32), atol=1e-4, rtol=1e-3) == 0


def test_dist_sssp_matches_single_device(chesapeake_csr, mesh8):
    from essentials_tpu.parallel.distributed import dist_sssp
    from essentials_tpu.algorithms import sssp
    dg = partition_graph(chesapeake_csr, 8)
    d = np.asarray(dist_sssp(dg, mesh8, 0))[:chesapeake_csr.n_rows]
    ref = sssp.cpu_reference(chesapeake_csr, 0)
    assert np.allclose(d, ref, rtol=1e-5, atol=1e-5)


def test_dist_sssp_weighted_rmat(mesh8):
    from essentials_tpu.parallel.distributed import dist_sssp
    from essentials_tpu.algorithms import sssp
    coo = generate.rmat(8, 8, seed=6, undirected=True, weighted=True)
    csr = Csr.from_coo(coo)
    dg = partition_graph(csr, 8)
    d = np.asarray(dist_sssp(dg, mesh8, 3))[:csr.n_rows]
    ref = sssp.cpu_reference(csr, 3)
    finite = np.isfinite(ref)
    assert np.array_equal(np.isfinite(d), finite)
    assert np.allclose(d[finite], ref[finite], rtol=1e-5, atol=1e-5)


def test_boundary_exchange_bfs_pr_sssp(chesapeake_csr, mesh8):
    """Boundary (all_to_all) mode matches all_gather mode on every algo."""
    from essentials_tpu.parallel.distributed import dist_sssp
    from essentials_tpu.algorithms import sssp
    dgb = partition_graph(chesapeake_csr, 8, exchange="boundary")
    assert dgb.boundary_size > 0
    assert dgb.comm_values_per_step <= dgb.n_vertices_global
    n = chesapeake_csr.n_rows
    d = np.asarray(dist_bfs(dgb, mesh8, 0))[:n]
    ref = bfs.cpu_reference(chesapeake_csr, 0)
    assert np.array_equal(d, ref)
    s = np.asarray(dist_sssp(dgb, mesh8, 0))[:n]
    sref = sssp.cpu_reference(chesapeake_csr, 0)
    assert np.allclose(s, sref, rtol=1e-5, atol=1e-5)
    p = np.asarray(dist_pagerank(dgb, mesh8))[:n]
    assert abs(p.sum() - 1.0) < 1e-3


def test_boundary_exchange_rmat(mesh8):
    from essentials_tpu.parallel.distributed import dist_sssp
    from essentials_tpu.algorithms import sssp
    coo = generate.rmat(8, 8, seed=12, undirected=True, weighted=True)
    csr = Csr.from_coo(coo)
    dgb = partition_graph(csr, 8, exchange="boundary")
    s = np.asarray(dist_sssp(dgb, mesh8, 1))[:csr.n_rows]
    ref = sssp.cpu_reference(csr, 1)
    finite = np.isfinite(ref)
    assert np.array_equal(np.isfinite(s), finite)
    assert np.allclose(s[finite], ref[finite], rtol=1e-5, atol=1e-5)


def test_overlap_mode_bfs_pr_sssp(chesapeake_csr, mesh8):
    """Comm/compute-overlap supersteps (per-peer ring processing) match
    the monolithic exchange path exactly, in BOTH exchange modes."""
    from essentials_tpu.parallel.distributed import dist_sssp
    from essentials_tpu.algorithms import sssp as sssp_alg
    csr = chesapeake_csr
    n = csr.n_rows
    for mode in ("all_gather", "boundary"):
        dg = partition_graph(csr, 8, exchange=mode, overlap=True)
        assert dg.peer_edges > 0
        dist = np.asarray(dist_bfs(dg, mesh8, 0, overlap=True))[:n]
        assert compare(dist, bfs.cpu_reference(csr, 0)) == 0, mode
        p_ref = np.asarray(dist_pagerank(dg, mesh8))[:n]
        p_ovl = np.asarray(dist_pagerank(dg, mesh8, overlap=True))[:n]
        np.testing.assert_allclose(p_ovl, p_ref, rtol=1e-5, atol=1e-7,
                                   err_msg=mode)
        d_ovl = np.asarray(dist_sssp(dg, mesh8, 0, overlap=True))[:n]
        d_ref = sssp_alg.cpu_reference(csr, 0)
        fin = np.isfinite(d_ref)
        assert np.array_equal(np.isfinite(d_ovl), fin), mode
        np.testing.assert_allclose(d_ovl[fin], d_ref[fin], rtol=1e-5,
                                   err_msg=mode)
