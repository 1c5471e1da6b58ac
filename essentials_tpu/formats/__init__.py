"""Host-side sparse format containers (COO/CSR/CSC) and conversions.

Capability parity with reference `include/gunrock/formats/` (csr.hxx, csc.hxx,
coo.hxx): owning storage structs with from_coo/from_csr conversions and a
binary (de)serialization cache. Here they are NumPy-backed host containers —
the *device* representation is the padded `essentials_tpu.graph.Graph` pytree,
built from these.
"""

from essentials_tpu.formats.coo import Coo
from essentials_tpu.formats.csr import Csr
from essentials_tpu.formats.csc import Csc

__all__ = ["Coo", "Csr", "Csc"]
