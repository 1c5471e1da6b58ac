"""Algorithm correctness vs CPU references (reference parity: the examples'
GPU-vs-CPU diff harness, SURVEY.md §4)."""

import numpy as np
import pytest

from essentials_tpu.algorithms import bfs
from essentials_tpu.algorithms import pr, ppr, color, kcore, hits, spmv, tc, bc
from essentials_tpu.formats import Csr
from essentials_tpu.graph import build_graph
from essentials_tpu.io import generate
from essentials_tpu.utils import compare


def test_pagerank_chesapeake(chesapeake, chesapeake_csr):
    res = pr.run(chesapeake, warmup=False)
    ref = pr.cpu_reference(chesapeake_csr)
    assert abs(float(np.asarray(res.ranks).sum()) - 1.0) < 1e-4
    assert compare(res.ranks, ref, atol=1e-5, rtol=1e-3) == 0


def test_pagerank_weighted(random_graph, random_graph_csr):
    res = pr.run(random_graph, warmup=False)
    ref = pr.cpu_reference(random_graph_csr)
    assert compare(res.ranks, ref, atol=1e-5, rtol=1e-3) == 0


def test_pagerank_dangling():
    # graph with a sink vertex (no out edges)
    coo = generate.chain(6)
    csr0 = Csr.from_coo(coo)
    # make vertex 5 a sink: drop its out-edges
    import numpy as np
    off = np.asarray(csr0.row_offsets)
    keep = np.repeat(np.arange(6), np.diff(off)) != 5
    from essentials_tpu.formats import Coo
    src = np.repeat(np.arange(6), np.diff(off))[keep]
    csr = Csr.from_coo(Coo(6, 6, src, np.asarray(csr0.col_indices)[keep],
                           np.asarray(csr0.values)[keep]))
    g = build_graph(csr, directed=True, weighted=False)
    res = pr.run(g, warmup=False)
    ref = pr.cpu_reference(csr)
    assert compare(res.ranks, ref, atol=1e-5, rtol=1e-3) == 0


def test_color_valid(chesapeake, chesapeake_csr):
    res = color.run(chesapeake, warmup=False)
    assert color.validate(chesapeake_csr, res.colors) == 0
    # colors should be reasonably few for a 39-vertex graph
    assert int(np.asarray(res.colors).max()) < 39


def test_color_random(random_graph, random_graph_csr):
    res = color.run(random_graph, warmup=False)
    assert color.validate(random_graph_csr, res.colors) == 0


def test_kcore_chesapeake(chesapeake, chesapeake_csr):
    res = kcore.run(chesapeake, warmup=False)
    ref = kcore.cpu_reference(chesapeake_csr)
    assert compare(res.core, ref) == 0


def test_kcore_clique_plus_tail():
    # 4-clique (core 3) with a pendant path (core 1)
    import numpy as np
    from essentials_tpu.formats import Coo
    edges = [(a, b) for a in range(4) for b in range(4) if a != b]
    edges += [(3, 4), (4, 3), (4, 5), (5, 4)]
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    csr = Csr.from_coo(Coo(6, 6, src, dst, np.ones(len(edges), np.float32)))
    g = build_graph(csr, directed=False, weighted=False)
    res = kcore.run(g, warmup=False)
    np.testing.assert_array_equal(np.asarray(res.core), [3, 3, 3, 3, 1, 1])


def test_hits(chesapeake, chesapeake_csr):
    res = hits.run(chesapeake, max_iterations=30, warmup=False)
    ra, rh = hits.cpu_reference(chesapeake_csr, max_iterations=30)
    assert compare(res.auth, ra, atol=1e-4, rtol=1e-3) == 0
    assert compare(res.hub, rh, atol=1e-4, rtol=1e-3) == 0
    auth_rank, hub_rank = hits.rank(res, 3)
    assert auth_rank[0] == int(np.argmax(ra))


def test_spmv(random_graph, random_graph_csr):
    import jax.numpy as jnp
    x = np.random.default_rng(0).random(
        random_graph.n_vertices_padded).astype(np.float32)
    x[random_graph.n_vertices:] = 0
    res = spmv.run(random_graph, jnp.asarray(x), warmup=False)
    ref = spmv.cpu_reference(random_graph_csr, x[:random_graph.n_vertices])
    assert compare(res.y, ref, atol=1e-4, rtol=1e-4) == 0


def test_spmv_push_equals_pull_symmetric(random_graph, random_graph_csr):
    import jax.numpy as jnp
    x = np.random.default_rng(1).random(
        random_graph.n_vertices_padded).astype(np.float32)
    x[random_graph.n_vertices:] = 0
    y1 = spmv.run(random_graph, jnp.asarray(x), variant="pull", warmup=False)
    y2 = spmv.run(random_graph, jnp.asarray(x), variant="push", warmup=False)
    assert compare(y1.y, np.asarray(y2.y), atol=1e-4, rtol=1e-4) == 0


def test_tc_known():
    # 4-clique has 4 triangles; per-vertex count 3 each
    import numpy as np
    from essentials_tpu.formats import Coo
    edges = [(a, b) for a in range(4) for b in range(4) if a != b]
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    csr = Csr.from_coo(Coo(4, 4, src, dst, np.ones(len(edges), np.float32)))
    res = tc.run(csr, warmup=False)
    assert res.total == 4
    np.testing.assert_array_equal(res.vertex_triangles, [3, 3, 3, 3])


def test_tc_vs_cpu(chesapeake_csr):
    res = tc.run(chesapeake_csr, warmup=False)
    total, vt = tc.cpu_reference(chesapeake_csr)
    assert res.total == total
    np.testing.assert_array_equal(res.vertex_triangles, vt)


def test_ppr(chesapeake, chesapeake_csr):
    res = ppr.run(chesapeake, 5, warmup=False)
    ref = ppr.cpu_reference(chesapeake_csr, 5)
    assert compare(res.p, ref, atol=1e-5, rtol=1e-3) == 0


def test_ppr_batch(chesapeake, chesapeake_csr):
    seeds = [0, 5, 11]
    out = np.asarray(ppr.run_batch(chesapeake, seeds))
    assert out.shape == (3, chesapeake.n_vertices)
    for i, s in enumerate(seeds):
        ref = ppr.cpu_reference(chesapeake_csr, s)
        assert compare(out[i], ref, atol=1e-5, rtol=1e-3) == 0


def test_bc_single_source(chesapeake, chesapeake_csr):
    res = bc.run(chesapeake, 0, warmup=False)
    ref = bc.cpu_reference(chesapeake_csr, sources=[0],
                           normalize_undirected=False)
    assert compare(res.bc_values, ref, atol=1e-3, rtol=1e-3) == 0


def test_bc_all_sources_small():
    coo = generate.uniform_random(40, 3, seed=5, undirected=True, weighted=False)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=False)
    res = bc.run_all(g, chunk=16, warmup=False)
    ref = bc.cpu_reference(csr)
    assert compare(res.bc_values, ref, atol=1e-2, rtol=1e-3) == 0
