"""Windowed compact-space SSSP: stage-exact reference algebra vs host
Dijkstra (the TPU kernels execute the same algebra)."""

import numpy as np
import pytest
import jax.numpy as jnp

import essentials_tpu as et
from essentials_tpu.formats import Csr
from essentials_tpu.io import generate
from essentials_tpu.algorithms import sssp
from essentials_tpu.ops import windowed_spmv as W
from essentials_tpu.ops.windowed_sssp import run_windowed_sssp


@pytest.mark.parametrize("seed,source", [(7, 0), (3, 11)])
def test_windowed_sssp_ref_matches_dijkstra(seed, source):
    coo = generate.rmat(12, 16, seed=seed, undirected=True, weighted=True)
    csr = Csr.from_coo(coo)
    g = et.build_graph(csr, directed=False, weighted=True,
                       build_router=True)
    plan = W.build_windowed_plan(g)
    assert plan is not None, "expected windowed support at this size"
    dist, it = run_windowed_sssp(g, plan, source, g.n_vertices + 1,
                                 use_pallas=False)
    ref = sssp.cpu_reference(csr, source)
    got = np.asarray(dist)[:csr.n_rows]
    reach = np.isfinite(ref)
    assert (np.isfinite(got) == reach).all()
    np.testing.assert_allclose(got[reach], ref[reach], rtol=1e-5,
                               atol=1e-6)


def test_windowed_sssp_matches_fused_ref():
    """Same distances as the edge-axis fused sweep reference."""
    from essentials_tpu.ops.fused_sssp import run_fused_sssp
    coo = generate.rmat(12, 16, seed=5, undirected=True, weighted=True)
    csr = Csr.from_coo(coo)
    g = et.build_graph(csr, directed=False, weighted=True,
                       build_router=True)
    plan = W.build_windowed_plan(g)
    assert plan is not None
    d_w, it_w = run_windowed_sssp(g, plan, 2, g.n_vertices + 1,
                                  use_pallas=False)
    d_f, it_f = run_fused_sssp(g, 2, g.n_vertices + 1)
    n = csr.n_rows
    np.testing.assert_array_equal(np.asarray(d_w)[:n], np.asarray(d_f)[:n])
