"""Validation primitive: device result vs host reference.

Reference parity: util::compare
(/root/reference/include/gunrock/util/compare.hxx:37-56) — returns the number
of mismatching elements; float comparisons take an absolute/relative
tolerance instead of the reference's user error-op.
"""

from __future__ import annotations

import numpy as np


def compare(result, reference, *, atol: float = 1e-5, rtol: float = 1e-5,
            verbose: bool = False, name: str = "array") -> int:
    """Count mismatches between ``result`` (device or host) and ``reference``."""
    a = np.asarray(result)
    b = np.asarray(reference)
    n = min(a.shape[0], b.shape[0])
    a, b = a[:n], b[:n]
    if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
        af = a.astype(np.float64)
        bf = b.astype(np.float64)
        both_nonfinite = ~np.isfinite(af) & ~np.isfinite(bf) & (np.sign(af) == np.sign(bf))
        mismatch = ~(np.isclose(af, bf, atol=atol, rtol=rtol) | both_nonfinite)
    else:
        mismatch = a != b
    errors = int(np.sum(mismatch))
    if verbose and errors:
        for i in np.nonzero(mismatch)[0][:16]:
            print(f"  {name}[{i}]: got {a[i]} expected {b[i]}")
    return errors
