"""Sparse-frontier advance: parity with the dense segment engine, and the
adaptive BFS/SSSP paths on a high-diameter grid (the regime it exists for)."""

import numpy as np
import jax
import jax.numpy as jnp

from essentials_tpu.graph import build_graph
from essentials_tpu.io import generate
from essentials_tpu.ops import advance, Combine
from essentials_tpu.ops.sparse_advance import (sparse_enabled, sparse_reach,
                                               sparse_relax_min)
from essentials_tpu.algorithms import bfs, sssp
from essentials_tpu.utils import compare


def _grid_graph(side=192):
    coo = generate.grid_2d(side, weighted=True)
    from essentials_tpu.formats import Csr
    csr = Csr.from_coo(coo)
    return csr, build_graph(csr, directed=False, weighted=True)


def test_sparse_reach_matches_dense():
    csr, g = _grid_graph()
    rng = np.random.default_rng(0)
    frontier = jnp.zeros(g.n_vertices_padded, jnp.bool_)
    frontier = frontier.at[jnp.asarray(
        rng.choice(g.n_vertices, 300, replace=False))].set(True)
    want = advance(g, lambda e: True, frontier, combine=Combine.OR,
                   with_frontier=False)
    got = sparse_reach(g, frontier, 512)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sparse_relax_matches_dense():
    csr, g = _grid_graph()
    rng = np.random.default_rng(1)
    vp = g.n_vertices_padded
    dist = jnp.asarray(rng.random(vp).astype(np.float32) * 10)
    frontier = jnp.zeros(vp, jnp.bool_).at[jnp.asarray(
        rng.choice(g.n_vertices, 200, replace=False))].set(True)
    want = advance(g, lambda e: e.src_vals[0] + e.weight, frontier,
                   src_values=(dist,), combine=Combine.MIN,
                   with_frontier=False)
    cand, pred = sparse_relax_min(g, frontier, dist, 512)
    v = g.n_vertices
    np.testing.assert_allclose(np.asarray(cand)[:v], np.asarray(want)[:v],
                               rtol=1e-6)


def test_adaptive_bfs_sssp_on_grid(monkeypatch):
    # lower the size gate so the sparse branch compiles in for a test-size
    # grid; 128x128 has ~254 BFS levels with frontiers <= ~256, so the
    # sparse branch is the one actually executing
    import essentials_tpu.ops.sparse_advance as sa
    monkeypatch.setattr(sa, "_MIN_EDGES", 0)
    csr, g = _grid_graph(160)   # 101K edges: above the 4*K*dmax gate
    assert sparse_enabled(g), (g.max_degree, g.n_edges)
    r = bfs.run(g, 0, compute_predecessors=False, warmup=False)
    assert compare(r.distances, bfs.cpu_reference(csr, 0)) == 0
    s = sssp.run(g, 0, warmup=False)
    assert compare(s.distances, sssp.cpu_reference(csr, 0),
                   atol=1e-4) == 0


# --------------------------------------------------------------------- #
# spray path (v2): sum-of-degrees budgeted, skew tolerant


def _skewed_graph():
    """Small power-law-ish graph: one hub + random edges."""
    rng = np.random.default_rng(7)
    n = 500
    src = rng.integers(0, n, 3000)
    dst = rng.integers(0, n, 3000)
    hub_dst = np.arange(1, 301)          # vertex 0 -> 300 out-edges
    src = np.concatenate([src, np.zeros(300, np.int64)])
    dst = np.concatenate([dst, hub_dst])
    from essentials_tpu.formats import Coo, Csr
    both_src = np.concatenate([src, dst])
    both_dst = np.concatenate([dst, src])
    keep = both_src != both_dst
    coo = Coo(n, n, both_src[keep].astype(np.int32),
              both_dst[keep].astype(np.int32),
              np.ones(int(keep.sum()), np.float32)).deduplicated()
    csr = Csr.from_coo(coo)
    return csr, build_graph(csr, directed=False, weighted=False)


def test_spray_candidates_enumerates_all_out_edges():
    from essentials_tpu.ops.sparse_advance import (spray_candidates,
                                                   frontier_out_degree)
    csr, g = _skewed_graph()
    rng = np.random.default_rng(3)
    members = np.concatenate([[0], rng.choice(
        np.arange(1, g.n_vertices), 40, replace=False)]).astype(np.int32)
    K, B = 64, 2048
    fidx = np.full(K, g.pad_vertex, np.int32)
    fidx[:members.size] = np.sort(members)
    fidx = jnp.asarray(fidx)
    offs, deg = frontier_out_degree(g, fidx)
    e, nb, src, valid = spray_candidates(g, fidx, offs, deg, B,
                                         with_src=True)
    e, nb, src, valid = map(np.asarray, (e, nb, src, valid))

    ro = np.asarray(csr.row_offsets)
    want = set()
    for v in members:
        for k in range(ro[v], ro[v + 1]):
            want.add((int(v), int(np.asarray(csr.col_indices)[k]), int(k)))
    got = {(int(src[j]), int(nb[j]), int(e[j]))
           for j in range(B) if valid[j]}
    assert got == want
    assert valid.sum() == len(want)


def test_spray_reach_matches_dense():
    from essentials_tpu.ops.sparse_advance import (spray_reach,
                                                   frontier_out_degree)
    csr, g = _skewed_graph()
    rng = np.random.default_rng(5)
    members = np.sort(rng.choice(g.n_vertices, 60, replace=False)
                      ).astype(np.int32)
    K, B = 64, 4096
    fidx = np.full(K, g.pad_vertex, np.int32)
    fidx[:members.size] = members
    fidx = jnp.asarray(fidx)
    frontier = jnp.zeros(g.n_vertices_padded, jnp.bool_
                         ).at[jnp.asarray(members)].set(True)
    unvisited = jnp.asarray(
        np.random.default_rng(6).random(g.n_vertices_padded) < 0.8)
    offs, deg = frontier_out_degree(g, fidx)
    newly, nidx, ncount = spray_reach(g, fidx, offs, deg, unvisited, B, K)

    want = advance(g, lambda e: True, frontier, combine=Combine.OR,
                   with_frontier=False) & unvisited
    np.testing.assert_array_equal(np.asarray(newly), np.asarray(want))
    w = np.flatnonzero(np.asarray(want))
    assert int(ncount) == w.size
    m = min(w.size, K)
    np.testing.assert_array_equal(np.asarray(nidx)[:m], w[:m])


def test_bfs_spray_path_end_to_end(monkeypatch):
    """Force spray_enabled on a small graph and check full-BFS parity."""
    import essentials_tpu.ops.sparse_advance as sa
    monkeypatch.setattr(sa, "_MIN_EDGES", 0)
    csr, g = _skewed_graph()
    res = bfs.run(g, 0, compute_predecessors=False, warmup=False)
    want = bfs.cpu_reference(csr, 0)
    np.testing.assert_array_equal(np.asarray(res.distances), want)


def test_color_spray_path_end_to_end(monkeypatch):
    """Force spray_enabled on a small skewed graph; coloring must stay
    proper and match the dense-only result's color count regime."""
    import numpy as np
    from essentials_tpu.ops import sparse_advance as sa
    monkeypatch.setattr(sa, "_MIN_EDGES", 0)
    import importlib
    from essentials_tpu.algorithms import color
    importlib.reload(color)
    from essentials_tpu.io import generate
    from essentials_tpu.formats import Csr
    from essentials_tpu.graph import build_graph
    coo = generate.rmat(9, 8, seed=3, undirected=True, weighted=False)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=False)
    res = color.run(g, warmup=False)
    assert color.validate(csr, res.colors) == 0
    importlib.reload(color)


def test_kcore_spray_path_end_to_end(monkeypatch):
    """Force spray_enabled on a small skewed graph; core numbers must
    match the host peeling reference exactly (incl. the k-jump)."""
    import numpy as np
    from essentials_tpu.ops import sparse_advance as sa
    monkeypatch.setattr(sa, "_MIN_EDGES", 0)
    import importlib
    from essentials_tpu.algorithms import kcore
    importlib.reload(kcore)
    from essentials_tpu.io import generate
    from essentials_tpu.formats import Csr
    from essentials_tpu.graph import build_graph
    coo = generate.rmat(9, 8, seed=4, undirected=True, weighted=False)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=False)
    res = kcore.run(g, warmup=False)
    ref = kcore.cpu_reference(csr)
    assert np.array_equal(np.asarray(res.core), ref)
    importlib.reload(kcore)
