"""kcore 3-tier ladder measurement at the suite's rmat20 graph + host
parity of the full adaptive run at this scale (first host-validated
rmat20 adaptive kcore — ADVICE r3 asked for exactly this evidence)."""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from essentials_tpu.formats import Csr
    from essentials_tpu.graph import build_graph
    from essentials_tpu.io import generate
    from essentials_tpu.algorithms import kcore
    from essentials_tpu.framework.enactor import enact

    t0 = time.perf_counter()
    coo = generate.rmat(20, 16, seed=1, undirected=True, weighted=False)
    csr = Csr.from_coo(coo)
    g = build_graph(csr, directed=False, weighted=False)
    print(f"built E={g.n_edges} ({time.perf_counter() - t0:.0f}s)",
          flush=True)

    res = kcore.run(g, warmup=True, variant="adaptive")
    print(f"adaptive: {res.elapsed_ms:.0f} ms, {res.iterations} waves",
          flush=True)
    res2 = kcore.run(g, warmup=False, variant="adaptive")
    print(f"adaptive (2nd): {res2.elapsed_ms:.0f} ms", flush=True)

    t0 = time.perf_counter()
    ref = kcore.cpu_reference(csr)
    print(f"host peel ({time.perf_counter() - t0:.0f}s); exact = "
          f"{np.array_equal(np.asarray(res.core), ref)}", flush=True)


if __name__ == "__main__":
    main()
