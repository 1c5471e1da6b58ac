"""Graph pytree tests (reference parity: graph accessors graph/csr.hxx:56-171
and analytics graph.hxx:326-404)."""

import numpy as np
import jax
import jax.numpy as jnp

from essentials_tpu.graph import (build_graph, average_degree,
                                  degree_standard_deviation, degree_histogram)
from essentials_tpu.io.sample import sample_csr


def test_build_shapes(sample_graph):
    g = sample_graph
    assert g.n_vertices == 4 and g.n_edges == 4
    assert g.n_vertices_padded >= 5
    assert g.n_edges_padded % 128 == 0
    assert g.row_offsets.shape[0] == g.n_vertices_padded + 1


def test_accessors(sample_graph):
    g = sample_graph
    np.testing.assert_array_equal(np.asarray(g.out_degrees())[:4], [0, 0, 2, 2])
    np.testing.assert_array_equal(np.asarray(g.in_degrees())[:4], [0, 1, 1, 2])
    assert int(g.get_number_of_neighbors(2)) == 2
    assert int(g.get_starting_edge(3)) == 2
    assert int(g.get_destination_vertex(0)) == 3
    assert int(g.get_source_vertex(0)) == 2
    assert float(g.get_edge_weight(1)) == 8.0


def test_csc_consistency(sample_graph):
    g = sample_graph
    # every CSC slot maps back to the right CSR edge
    e = g.n_edges
    eid = np.asarray(g.csc_edge_ids)[:e]
    np.testing.assert_array_equal(np.asarray(g.csc_src_indices)[:e],
                                  np.asarray(g.src_indices)[eid])
    np.testing.assert_array_equal(np.asarray(g.csc_dst_indices)[:e],
                                  np.asarray(g.col_indices)[eid])
    np.testing.assert_allclose(np.asarray(g.csc_values)[:e],
                               np.asarray(g.values)[eid])
    # dst-sorted
    assert np.all(np.diff(np.asarray(g.csc_dst_indices)[:e]) >= 0)


def test_padding_invariants(sample_graph):
    g = sample_graph
    e, ep = g.n_edges, g.n_edges_padded
    assert np.all(np.asarray(g.src_indices)[e:] == g.pad_vertex)
    assert np.all(np.asarray(g.col_indices)[e:] == g.pad_vertex)
    assert np.all(np.asarray(g.values)[e:] == 0)
    ro = np.asarray(g.row_offsets)
    assert ro[g.n_vertices] == e and ro[-1] == ep


def test_graph_is_pytree(sample_graph):
    leaves = jax.tree_util.tree_leaves(sample_graph)
    assert all(isinstance(l, jax.Array) for l in leaves)

    @jax.jit
    def f(g):
        return jnp.sum(g.values)

    assert float(f(sample_graph)) == 22.0


def test_analytics(sample_graph):
    assert average_degree(sample_graph) == 1.0
    assert abs(degree_standard_deviation(sample_graph) - 1.0) < 1e-6
    hist = np.asarray(degree_histogram(sample_graph))
    assert hist[0] == 2 and hist[2] == 2  # two deg-0, two deg-2
