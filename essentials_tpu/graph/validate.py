"""Graph input validation (fail-fast, host-side).

The reference throws mid-run from device flag read-backs on malformed input
(mst.hxx:242-247); here malformed structure is rejected eagerly at build
time with precise messages.
"""

from __future__ import annotations

import numpy as np

from essentials_tpu.errors import throw_if
from essentials_tpu.formats.csr import Csr


def validate_csr(csr: Csr, *, require_sorted_columns: bool = False,
                 require_symmetric: bool = False) -> None:
    off = np.asarray(csr.row_offsets, np.int64)
    cols = np.asarray(csr.col_indices, np.int64)
    throw_if(off[0] != 0, "csr: row_offsets[0] must be 0")
    throw_if(off[-1] != csr.nnz,
             f"csr: row_offsets[-1]={off[-1]} != nnz={csr.nnz}")
    throw_if(bool(np.any(np.diff(off) < 0)),
             "csr: row_offsets must be non-decreasing")
    if csr.nnz:
        throw_if(bool(cols.min() < 0) or bool(cols.max() >= csr.n_cols),
                 "csr: column index out of range")
    throw_if(not np.isfinite(np.asarray(csr.values, np.float64)).all(),
             "csr: non-finite edge weight")
    if require_sorted_columns:
        src = np.repeat(np.arange(csr.n_rows), np.diff(off))
        key = src * csr.n_cols + cols
        throw_if(bool(np.any(np.diff(key) < 0)),
                 "csr: columns not sorted within rows")
    if require_symmetric:
        throw_if(csr.n_rows != csr.n_cols, "csr: not square")
        a = set(zip(src := np.repeat(np.arange(csr.n_rows), np.diff(off)),
                    cols))
        throw_if(any((c, s) not in a for s, c in a),
                 "csr: structure not symmetric")
