"""Checkpoint/resume + graph validation tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from essentials_tpu.errors import EssentialsError
from essentials_tpu.formats import Csr
from essentials_tpu.graph.validate import validate_csr
from essentials_tpu.io.sample import sample_csr
from essentials_tpu.utils.checkpoint import save_state, load_state
from essentials_tpu.algorithms import bfs, sssp


def test_checkpoint_roundtrip(tmp_path, sample_graph):
    st = sssp.init(sample_graph, 2)
    p = tmp_path / "ckpt.npz"
    save_state(str(p), st, step=7, meta={"algo": "sssp"})
    loaded, step = load_state(str(p), st)
    assert step == 7
    np.testing.assert_array_equal(np.asarray(loaded.distances),
                                  np.asarray(st.distances))
    np.testing.assert_array_equal(np.asarray(loaded.frontier),
                                  np.asarray(st.frontier))


def test_checkpoint_resume_equivalence(tmp_path, chesapeake):
    """Run 2 steps, checkpoint, resume -> same result as uninterrupted."""
    st = bfs.init(chesapeake, 0)
    for it in range(2):
        st = bfs.step(chesapeake, st, it)
    p = tmp_path / "bfs.npz"
    save_state(str(p), st, step=2)
    resumed, step = load_state(str(p), st)
    a = bfs.step(chesapeake, resumed, step)
    b = bfs.step(chesapeake, st, 2)
    np.testing.assert_array_equal(np.asarray(a.distances),
                                  np.asarray(b.distances))


def test_checkpoint_structure_mismatch(tmp_path, sample_graph):
    st = bfs.init(sample_graph, 0)
    p = tmp_path / "x.npz"
    save_state(str(p), st)
    with pytest.raises(ValueError):
        load_state(str(p), (st.distances,))


def test_validate_good():
    validate_csr(sample_csr())


def test_validate_bad_offsets():
    with pytest.raises(EssentialsError):
        validate_csr(Csr(2, 2, np.array([0, 3, 2]),
                         np.array([0, 1], np.int32),
                         np.ones(2, np.float32)))


def test_validate_bad_column():
    with pytest.raises(EssentialsError):
        validate_csr(Csr(2, 2, np.array([0, 1, 2]),
                         np.array([0, 5], np.int32),
                         np.ones(2, np.float32)))


def test_validate_nonfinite_weight():
    with pytest.raises(EssentialsError):
        validate_csr(Csr(2, 2, np.array([0, 1, 2]),
                         np.array([0, 1], np.int32),
                         np.array([1.0, np.nan], np.float32)))
