"""Edge-axis fused BFS (interpret mode on CPU)."""

import numpy as np
import pytest

import essentials_tpu.ops.fused_bfs as fb

fb._INTERPRET = True

from essentials_tpu.algorithms import bfs  # noqa: E402
from essentials_tpu.formats import Csr  # noqa: E402
from essentials_tpu.graph import build_graph  # noqa: E402
from essentials_tpu.io import generate  # noqa: E402


@pytest.fixture(scope="module")
def g_rmat():
    coo = generate.rmat(10, 8, seed=4, undirected=True, weighted=False)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=False, build_router=True)
    return csr, g


def test_symmetric_layout_detected(g_rmat):
    _, g = g_rmat
    assert g.symmetric_layout
    assert bfs.fused_supported(g)


def test_fused_bfs_matches_reference(g_rmat):
    csr, g = g_rmat
    for src in (0, 5, 100):
        res = bfs.run(g, src, warmup=False, variant="fused")
        ref = bfs.cpu_reference(csr, src)
        assert np.array_equal(np.asarray(res.distances), ref), src


def test_fused_bfs_isolated_source():
    # isolated vertex as source: 1 round, only the source reached
    import numpy as np
    from essentials_tpu.formats.coo import Coo
    coo = Coo(8, 8, np.array([1, 2, 2, 1], np.int32),
              np.array([2, 1, 3, 3], np.int32),
              np.ones(4, np.float32))
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=False, build_router=True)
    if not bfs.fused_supported(g):
        pytest.skip("tiny graph: no router plans")
    res = bfs.run(g, 0, warmup=False, variant="fused")
    ref = bfs.cpu_reference(csr, 0)
    assert np.array_equal(np.asarray(res.distances), ref)


def test_fused_grid_graph():
    coo = generate.grid_2d(24, weighted=False)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=False, build_router=True)
    res = bfs.run(g, 0, warmup=False, variant="fused")
    ref = bfs.cpu_reference(csr, 0)
    assert np.array_equal(np.asarray(res.distances), ref)


def test_fused_route_or_matches_fallback():
    """The 3-kernel fused (eq -> route -> segmented OR) pipeline matches
    the separate-ops fallback (interpret mode, cube-sized graph)."""
    import jax.numpy as jnp
    from essentials_tpu.ops.permute import apply_plan
    from essentials_tpu.ops.scan_kernels import segmented_scan
    from essentials_tpu.ops import cube_router
    coo = generate.rmat(12, 10, seed=6, undirected=True, weighted=False)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=False, build_router=True)
    assert isinstance(g.route_fwd, cube_router.CubePlan)
    lev = fb.init_lev_exp(g, 7)
    for it in (0,):
        S_fused = fb.fused_route_or(g, lev, it)
        y = (lev == it).astype(jnp.int32)
        z = apply_plan(y, g.route_fwd, n_valid=g.n_edges_padded)
        S_ref = segmented_scan(z, g.csc_seg_flags, "max")
        assert np.array_equal(np.asarray(S_fused), np.asarray(S_ref))


def test_fused_pagerank_matches_generic():
    from essentials_tpu.algorithms import pr
    coo = generate.rmat(11, 8, seed=8, undirected=True, weighted=True)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=True, build_router=True)
    assert pr.fused_supported(g)
    rf = pr.run(g, warmup=False, variant="fused", max_iterations=50)
    rg = pr.run(g, warmup=False, variant="generic", max_iterations=50)
    ref = pr.cpu_reference(csr, max_iterations=50)
    assert np.allclose(np.asarray(rf.ranks), ref, rtol=2e-3, atol=1e-7)
    assert np.allclose(np.asarray(rf.ranks), np.asarray(rg.ranks),
                       rtol=2e-3, atol=1e-7)


def test_fused_pagerank_isolated_vertices():
    from essentials_tpu.algorithms import pr
    from essentials_tpu.formats.coo import Coo
    # vertices 4..7 isolated
    coo = Coo(8, 8, np.array([0, 1, 1, 2, 2, 0], np.int32),
              np.array([1, 0, 2, 1, 0, 2], np.int32),
              np.ones(6, np.float32))
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=True, build_router=True)
    if not pr.fused_supported(g):
        import pytest as _pytest
        _pytest.skip("tiny graph: no router plans")
    rf = pr.run(g, warmup=False, variant="fused", max_iterations=80)
    ref = pr.cpu_reference(csr, max_iterations=80)
    assert np.allclose(np.asarray(rf.ranks), ref, rtol=2e-3, atol=1e-7)


def test_hybrid_bfs_matches_reference(g_rmat):
    """Hybrid driver (spray + dense levels, on-device mode switching)."""
    import jax
    csr, g = g_rmat
    for src in (0, 5, 100):
        for force in (True, False):
            dist, it = jax.jit(
                lambda s: bfs.run_hybrid_levels(g, s, 64,
                                                spray_override=force))(src)
            ref = bfs.cpu_reference(csr, src)
            assert np.array_equal(np.asarray(dist)[:csr.n_rows], ref), \
                (src, force)


def test_hybrid_grid_graph():
    """High-diameter graph: spray-only trajectory (forced)."""
    import jax
    coo = generate.grid_2d(24, weighted=False)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=False, build_router=True)
    if not bfs.fused_supported(g):
        pytest.skip("tiny graph: no router plans")
    dist, it = jax.jit(
        lambda s: bfs.run_hybrid_levels(g, s, 2000,
                                        spray_override=True))(0)
    ref = bfs.cpu_reference(csr, 0)
    assert np.array_equal(np.asarray(dist)[:csr.n_rows], ref)


def test_phased_bfs_matches_reference(g_rmat):
    """Phase-split driver (spray loop A / dense B / spray tail C / dense
    safety D): exact distances for both spray-enabled and dense-only
    trajectories."""
    import jax
    csr, g = g_rmat
    for src in (0, 5, 100):
        for force in (True, False):
            dist, it = jax.jit(
                lambda s: bfs.run_phased_levels(g, s, 64,
                                                spray_override=force))(src)
            ref = bfs.cpu_reference(csr, src)
            assert np.array_equal(np.asarray(dist)[:csr.n_rows], ref), \
                (src, force)


def test_phased_grid_graph():
    """High-diameter graph: the A loop alone must run to completion."""
    import jax
    coo = generate.grid_2d(24, weighted=False)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=False, build_router=True)
    if not bfs.fused_supported(g):
        pytest.skip("tiny graph: no router plans")
    dist, it = jax.jit(
        lambda s: bfs.run_phased_levels(g, s, 2000,
                                        spray_override=True))(0)
    ref = bfs.cpu_reference(csr, 0)
    assert np.array_equal(np.asarray(dist)[:csr.n_rows], ref)
