"""A/B the kcore engine toggles (cascade, dense-chain) at rmat20."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from benchmarks.run_benchmarks import _load
from benchmarks.replay import replay_ms, enact_body
from essentials_tpu.graph import build_graph
from essentials_tpu import algorithms as A

spec = sys.argv[1] if len(sys.argv) > 1 else "gen:rmat20x16"
csr, ds = _load(spec)
g = build_graph(csr, directed=False, weighted=True)
deg = np.diff(np.asarray(csr.row_offsets))
sources = np.argsort(-deg)[:8].astype(np.int32)
v1 = g.n_vertices + 1

for cascade, chain in [(True, True), (False, True), (True, False),
                       (False, False)]:
    A.kcore._TINY_CASCADE = cascade
    A.kcore._DENSE_CHAIN = chain

    def step_fn(g, st, it, c=cascade, ch=chain):
        return A.kcore.step(g, st, it)

    ms, it, cyc = replay_ms(
        enact_body(step_fn, A.kcore.converged, v1), g, A.kcore.init(g),
        sources, R=4)
    print(f"cascade={int(cascade)} chain={int(chain)}: {ms:8.1f} ms  "
          f"iters={it}  {cyc}", flush=True)
