"""Array printing helpers.

Reference parity: print::head (/root/reference/include/gunrock/util/print.hxx:31-42).
"""

from __future__ import annotations

import numpy as np


def print_head(array, k: int = 10, name: str = "array") -> None:
    a = np.asarray(array)
    k = min(k, a.shape[0])
    print(f"{name} (first {k} of {a.shape[0]}): {a[:k]}")
