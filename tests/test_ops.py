"""Operator tests on the 4-vertex sample fixture (reference parity:
unittests/framework/operators/for.cuh style — exact expected outputs)."""

import numpy as np
import jax.numpy as jnp

from essentials_tpu.frontier import (empty_frontier, full_frontier,
                                     frontier_from_indices, frontier_size,
                                     frontier_is_empty, frontier_to_indices)
from essentials_tpu.ops import (advance, advance_edges, filter_frontier,
                                for_each_vertex, for_each_edge, neighbor_reduce,
                                uniquify, batch_execute, Combine, AdvanceIO)

# sample graph edges: 2->3 (5), 2->1 (8), 3->2 (3), 3->3 (6)


def test_frontier_basics(sample_graph):
    g = sample_graph
    f = frontier_from_indices(g, jnp.asarray([2]))
    assert int(frontier_size(f)) == 1
    assert not bool(frontier_is_empty(f))
    assert bool(frontier_is_empty(empty_frontier(g)))
    assert int(frontier_size(full_frontier(g))) == 4
    idx = np.asarray(frontier_to_indices(f, 4))
    assert idx[0] == 2 and np.all(idx[1:] == -1)


def test_advance_from_vertex(sample_graph):
    g = sample_graph
    f = frontier_from_indices(g, jnp.asarray([2]))
    combined, out = advance(g, lambda e: e.weight, f, combine=Combine.MIN)
    c = np.asarray(combined)[:4]
    assert c[1] == 8.0 and c[3] == 5.0
    assert np.isinf(c[0]) and np.isinf(c[2])
    np.testing.assert_array_equal(np.asarray(out)[:4], [False, True, False, True])


def test_advance_cond(sample_graph):
    g = sample_graph
    f = frontier_from_indices(g, jnp.asarray([3]))
    # only edges with weight > 4 fire: 3->3 (6) yes, 3->2 (3) no
    _, out = advance(g, lambda e: (e.weight, e.weight > 4), f,
                     combine=Combine.MAX)
    np.testing.assert_array_equal(np.asarray(out)[:4], [False, False, False, True])


def test_advance_graph_input_sum(sample_graph):
    g = sample_graph
    combined = advance(g, lambda e: e.weight, None,
                       input_kind=AdvanceIO.GRAPH, combine=Combine.SUM,
                       with_frontier=False)
    # incoming weight sums per dst: v1: 8, v2: 3, v3: 5+6=11
    np.testing.assert_allclose(np.asarray(combined)[:4], [0, 8, 3, 11])


def test_advance_edge_frontier_input(sample_graph):
    g = sample_graph
    ef = jnp.zeros(g.n_edges_padded, bool).at[0].set(True)  # edge 2->3 only
    combined, out = advance(g, lambda e: e.weight, ef,
                            input_kind=AdvanceIO.EDGES, combine=Combine.SUM)
    np.testing.assert_allclose(np.asarray(combined)[:4], [0, 0, 0, 5])


def test_advance_src_dst_values(sample_graph):
    g = sample_graph
    f = frontier_from_indices(g, jnp.asarray([2, 3]))
    sv = jnp.asarray([10., 20., 30., 40.] + [0.] * (g.n_vertices_padded - 4))
    dv = jnp.asarray([1., 2., 3., 4.] + [0.] * (g.n_vertices_padded - 4))
    combined = advance(g, lambda e: e.src_vals[0] + e.dst_vals[0], f,
                       src_values=(sv,), dst_values=(dv,),
                       combine=Combine.SUM, with_frontier=False)
    # per dst: v1: 30+2=32 ; v2: 40+3=43 ; v3: (30+4)+(40+4)=78
    np.testing.assert_allclose(np.asarray(combined)[:4], [0, 32, 43, 78])


def test_advance_edges_output(sample_graph):
    g = sample_graph
    f = full_frontier(g)
    out = advance_edges(g, lambda e: e.weight > 4, f)
    # CSR edge order [5,8,3,6] -> fires at 0,1,3
    np.testing.assert_array_equal(np.asarray(out)[:4], [True, True, False, True])


def test_filter(sample_graph):
    g = sample_graph
    f = full_frontier(g)
    out = filter_frontier(g, f, lambda v: v % 2 == 0)
    np.testing.assert_array_equal(np.asarray(out)[:4], [True, False, True, False])


def test_for_each(sample_graph):
    g = sample_graph
    vals = for_each_vertex(g, lambda v: v * 10)
    np.testing.assert_array_equal(np.asarray(vals)[:4], [0, 10, 20, 30])
    assert np.all(np.asarray(vals)[4:] == 0)
    evals = for_each_edge(g, lambda s, d, e, w: w * 2)
    np.testing.assert_allclose(np.asarray(evals)[:4], [10, 16, 6, 12])


def test_neighbor_reduce_spmv(sample_graph):
    g = sample_graph
    x = jnp.zeros(g.n_vertices_padded).at[:4].set(jnp.asarray([1., 2., 3., 4.]))
    y = neighbor_reduce(g, lambda e: e.weight * e.dst_vals[0], dst_values=(x,))
    # y[2] = 5*4 + 8*2 = 36 ; y[3] = 3*3 + 6*4 = 33
    np.testing.assert_allclose(np.asarray(y)[:4], [0, 0, 36, 33])


def test_uniquify(sample_graph):
    g = sample_graph
    f = full_frontier(g)
    assert uniquify(f) is f
    idx = jnp.asarray([3, 1, 3, -1, 1], jnp.int32)
    out = uniquify(idx, capacity=g.n_vertices_padded)
    np.testing.assert_array_equal(np.asarray(out)[:4], [False, True, False, True])


def test_batch_execute(sample_graph):
    g = sample_graph

    def job(seed):
        return seed * 2

    out = batch_execute(job, jnp.arange(5))
    np.testing.assert_array_equal(np.asarray(out), [0, 2, 4, 6, 8])
