"""Bitmap-intersection TC path (Pallas DMA kernel, interpret mode on CPU)."""

import numpy as np
import pytest

import essentials_tpu.ops.bitmap_intersect as bi

bi._INTERPRET = True

from essentials_tpu.algorithms import tc  # noqa: E402
from essentials_tpu.formats import Csr  # noqa: E402
from essentials_tpu.io import generate  # noqa: E402


@pytest.mark.parametrize("scale,ef,seed", [(8, 8, 2), (10, 4, 7)])
def test_bitmap_tc_matches_reference(scale, ef, seed):
    coo = generate.rmat(scale, ef, seed=seed, undirected=True,
                        weighted=False)
    csr = Csr.from_coo(coo)
    ref_total, ref_vt = tc.cpu_reference(csr)
    res = tc.run(csr, warmup=False, variant="bitmap")
    assert res.total == ref_total
    assert np.array_equal(res.vertex_triangles, ref_vt)


def test_bitmap_matches_sorted_and_dense():
    coo = generate.rmat(9, 8, seed=5, undirected=True, weighted=False)
    csr = Csr.from_coo(coo)
    r_bitmap = tc.run(csr, warmup=False, variant="bitmap")
    r_dense = tc.run(csr, warmup=False, variant="dense")
    r_sorted = tc.run(csr, warmup=False, variant="sorted")
    assert r_bitmap.total == r_dense.total == r_sorted.total
    assert np.array_equal(r_bitmap.vertex_triangles,
                          r_dense.vertex_triangles)
    assert np.array_equal(r_bitmap.vertex_triangles,
                          r_sorted.vertex_triangles)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    n = 300
    src = rng.integers(0, n, 500).astype(np.int64)
    dst = rng.integers(0, n, 500).astype(np.int64)
    b = bi.pack_bitmap_rows(n, src, dst)
    words = np.asarray(b).view(np.uint32).reshape(n + 1, -1)
    for s, d in zip(src[:50], dst[:50]):
        assert (words[s, d >> 5] >> (d & 31)) & 1 == 1
    assert not words[n].any()  # pad row stays zero


def test_shift_variant_total_matches():
    """Shift-pass sort-join total vs the set-based host reference."""
    import numpy as np
    from essentials_tpu.algorithms import tc
    from essentials_tpu.formats import Csr
    from essentials_tpu.io import generate
    for seed in (3, 11):
        coo = generate.rmat(9, 12, seed=seed, undirected=True,
                            weighted=False)
        csr = Csr.from_coo(coo)
        ref_total, _ = tc.cpu_reference(csr)
        res = tc.run(csr, warmup=False, variant="shift")
        assert res.total == ref_total, (seed, res.total, ref_total)
        assert tc.cpu_reference_total(csr) == ref_total


def test_generic_intersection_operator():
    """ops.intersect: counts + jaccard on arbitrary pair queries vs host
    sets (reference get_intersection_count parity, csr.hxx:110-167)."""
    import numpy as np
    from essentials_tpu.ops import intersect
    from essentials_tpu.formats import Csr
    from essentials_tpu.io import generate
    coo = generate.rmat(8, 8, seed=9, undirected=True, weighted=False)
    csr = Csr.from_coo(coo)
    off = np.asarray(csr.row_offsets)
    cols = np.asarray(csr.col_indices)
    adj = [set(cols[off[i]:off[i + 1]].tolist())
           for i in range(csr.n_rows)]
    rng = np.random.default_rng(0)
    u = rng.integers(0, csr.n_rows, 64)
    v = rng.integers(0, csr.n_rows, 64)
    got, wit = intersect.intersection_counts(csr, u, v, witnesses=True)
    ref = np.array([len(adj[a] & adj[b]) for a, b in zip(u, v)])
    assert np.array_equal(got, ref)
    # witness histogram: per-vertex membership count over all pairs
    wref = np.zeros(csr.n_rows, np.int64)
    for a, b in zip(u, v):
        for c in adj[a] & adj[b]:
            wref[c] += 1
    assert np.array_equal(wit, wref)
    j = intersect.jaccard(csr, u, v)
    jref = np.array([len(adj[a] & adj[b]) / max(len(adj[a] | adj[b]), 1)
                     for a, b in zip(u, v)])
    np.testing.assert_allclose(j, jref, rtol=1e-12)


def test_chunked_intersection_above_dense_cap(monkeypatch):
    """The chunked any-scale path (VERDICT r4 #9): force the dense cap
    and chunk width small so a mid-size graph runs multiple column
    chunks, and compare against host sets + the dense path."""
    import numpy as np
    from essentials_tpu.ops import intersect
    from essentials_tpu.formats import Csr
    from essentials_tpu.io import generate
    coo = generate.uniform_random(10000, 4, seed=4, undirected=True,
                                  weighted=False)
    csr = Csr.from_coo(coo)
    off = np.asarray(csr.row_offsets)
    cols = np.asarray(csr.col_indices)
    adj = [set(cols[off[i]:off[i + 1]].tolist())
           for i in range(csr.n_rows)]
    rng = np.random.default_rng(1)
    u = rng.integers(0, csr.n_rows, 48)
    v = rng.integers(0, csr.n_rows, 48)
    ref = np.array([len(adj[a] & adj[b]) for a, b in zip(u, v)])
    wref = np.zeros(csr.n_rows, np.int64)
    for a, b in zip(u, v):
        for c in adj[a] & adj[b]:
            wref[c] += 1

    monkeypatch.setattr(intersect, "_DENSE_V_MAX", 64)
    monkeypatch.setattr(intersect, "_CHUNK_BYTES", 1 << 12)  # -> 3 chunks
    got, wit = intersect.intersection_counts(csr, u, v, witnesses=True)
    assert np.array_equal(got, ref)
    assert np.array_equal(wit, wref)
