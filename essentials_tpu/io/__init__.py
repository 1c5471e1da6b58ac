"""Graph IO: Matrix Market (.mtx), .smtx, binary cache, fixtures, generators.

Capability parity with reference `include/gunrock/io/` (matrix_market.hxx,
smtx.hxx, sample.hxx, points.hxx, detail/mmio.*). A native C++ fast-path parser
lives in essentials_tpu/native (loaded via ctypes when built); the NumPy parser
here is the always-available fallback with identical semantics.
"""

from essentials_tpu.io.matrix_market import load_mtx
from essentials_tpu.io.smtx import load_smtx
from essentials_tpu.io.sample import sample_csr, sample_coo
from essentials_tpu.io.loader import load_graph_file, is_market, is_binary_csr
from essentials_tpu.io import generate

__all__ = [
    "load_mtx", "load_smtx", "sample_csr", "sample_coo",
    "load_graph_file", "is_market", "is_binary_csr", "generate",
]
