"""Formats + IO tests (reference parity: unittests/io/smtx.cuh and the
csr binary round-trip in formats/csr.hxx:159-240)."""

import numpy as np
import pytest

from essentials_tpu import dtypes
from essentials_tpu.formats import Coo, Csr, Csc
from essentials_tpu.io.matrix_market import parse_mtx_bytes, write_mtx, load_mtx
from essentials_tpu.io.sample import sample_csr, sample_coo
from essentials_tpu.io import generate, load_smtx


def test_sample_fixture():
    csr = sample_csr()
    assert csr.n_rows == 4 and csr.nnz == 4
    np.testing.assert_array_equal(csr.row_offsets, [0, 0, 0, 2, 4])
    np.testing.assert_array_equal(csr.col_indices, [3, 1, 2, 3])
    np.testing.assert_allclose(csr.values, [5, 8, 3, 6])


def test_coo_csr_roundtrip():
    coo = sample_coo()
    csr = Csr.from_coo(coo)
    back = csr.to_coo()
    np.testing.assert_array_equal(back.row_indices, [2, 2, 3, 3])
    np.testing.assert_array_equal(back.col_indices, [1, 3, 2, 3])


def test_csc_from_coo():
    csc = Csc.from_coo(sample_coo())
    np.testing.assert_array_equal(csc.col_offsets, [0, 0, 1, 2, 4])
    np.testing.assert_array_equal(csc.row_indices, [2, 3, 2, 3])


def test_mtx_parse_pattern_symmetric():
    data = b"""%%MatrixMarket matrix coordinate pattern symmetric
% comment
3 3 2
2 1
3 2
"""
    coo = parse_mtx_bytes(data)
    # symmetric expansion: 2 off-diagonals -> 4 edges
    assert coo.nnz == 4
    pairs = set(zip(coo.row_indices.tolist(), coo.col_indices.tolist()))
    assert pairs == {(1, 0), (0, 1), (2, 1), (1, 2)}
    assert np.all(coo.values == 1.0)


def test_mtx_parse_real_general():
    data = b"""%%MatrixMarket matrix coordinate real general
2 3 3
1 1 5.0
2 3 -1.5
1 2 2
"""
    coo = parse_mtx_bytes(data)
    assert coo.n_rows == 2 and coo.n_cols == 3 and coo.nnz == 3
    np.testing.assert_allclose(sorted(coo.values.tolist()), [-1.5, 2.0, 5.0])


def test_mtx_skew_symmetric():
    data = b"""%%MatrixMarket matrix coordinate real skew-symmetric
2 2 1
2 1 3.0
"""
    coo = parse_mtx_bytes(data)
    assert coo.nnz == 2
    d = {(r, c): v for r, c, v in
         zip(coo.row_indices.tolist(), coo.col_indices.tolist(), coo.values.tolist())}
    assert d[(1, 0)] == 3.0 and d[(0, 1)] == -3.0


def test_mtx_write_read_roundtrip(tmp_path):
    coo = sample_coo()
    p = tmp_path / "x.mtx"
    write_mtx(p, coo)
    back = load_mtx(p, use_native=False)
    # from_coo sorts columns within each row; sample rows are {2:[1,3], 3:[2,3]}
    np.testing.assert_array_equal(Csr.from_coo(back).col_indices, [1, 3, 2, 3])


def test_csr_binary_cache(tmp_path):
    csr = sample_csr()
    p = tmp_path / "x.csr.npz"
    csr.write_binary(p)
    back = Csr.read_binary(p)
    np.testing.assert_array_equal(back.row_offsets, csr.row_offsets)
    np.testing.assert_array_equal(back.col_indices, csr.col_indices)
    np.testing.assert_allclose(back.values, csr.values)


def test_smtx(tmp_path):
    p = tmp_path / "m.smtx"
    p.write_text("3, 4, 5\n0 2 3 5\n0 3 1 2 3\n")
    csr = load_smtx(p)
    assert csr.n_rows == 3 and csr.n_cols == 4 and csr.nnz == 5
    np.testing.assert_array_equal(csr.row_offsets, [0, 2, 3, 5])
    assert np.all((csr.values >= 0) & (csr.values < 1))


def test_chesapeake_loads(chesapeake_csr):
    # 39 vertices / 340 directed edges after symmetric expansion (SURVEY §6).
    assert chesapeake_csr.n_rows == 39
    assert chesapeake_csr.nnz == 340


def test_generators():
    coo = generate.rmat(6, 4, seed=3)
    assert coo.n_rows == 64 and coo.nnz > 64
    g = generate.grid_2d(4)
    assert g.n_rows == 16 and g.nnz == 2 * (2 * 4 * 3)
    ch = generate.chain(5)
    assert ch.nnz == 8
    # no self loops / duplicates in rmat
    assert np.all(coo.row_indices != coo.col_indices)
