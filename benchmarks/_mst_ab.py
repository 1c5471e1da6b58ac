"""A/B the sort-centric MST round (replay protocol) + host-weight check."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from benchmarks.run_benchmarks import _load
from benchmarks.replay import replay_ms, enact_body
from essentials_tpu.graph import build_graph
from essentials_tpu import algorithms as A

spec = sys.argv[1] if len(sys.argv) > 1 else "gen:rmat20x16"
check = "--check" in sys.argv
csr, ds = _load(spec)
g = build_graph(csr, directed=False, weighted=True)
deg = np.diff(np.asarray(csr.row_offsets))
sources = np.argsort(-deg)[:8].astype(np.int32)
v1 = g.n_vertices + 1

ms, it, cyc = replay_ms(
    enact_body(A.mst.step, A.mst.converged, v1), g, A.mst.init(g),
    sources, R=4)
print(f"{ds}: mst {ms:.1f} ms  rounds={it}  {cyc}", flush=True)

if check:
    res = A.mst.run(g, warmup=True)
    t0 = time.perf_counter()
    ref = A.mst.cpu_reference(csr)
    print(f"weight {res.total_weight:.4f} vs host Kruskal {ref:.4f} "
          f"(host {time.perf_counter()-t0:.0f}s) "
          f"rel err {abs(res.total_weight-ref)/max(abs(ref),1e-9):.2e}",
          flush=True)
