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
