"""essentials_tpu — a TPU-native graph analytics & message-passing framework.

A from-scratch rebuild of the capabilities of gunrock/essentials (CUDA, see
/root/reference) designed for TPU hardware: graphs are immutable pytrees with
static padded shapes, frontiers are dense boolean maps over vertices, algorithm
iterations are `jax.lax.while_loop` supersteps compiled once with `jax.jit`,
roofline-critical sparse paths are Pallas kernels, and scale-out uses
`jax.sharding.Mesh` + `shard_map` with XLA collectives over ICI/DCN.

Layer map (mirrors reference SURVEY.md §1, re-designed TPU-first):

  L0 runtime   -> XLA/jit + device helpers        (essentials_tpu.runtime)
  L1 memory    -> jax arrays / pytrees            (implicit)
  L2 formats   -> host COO/CSR/CSC containers     (essentials_tpu.formats)
  L3 graph     -> device Graph pytree + views     (essentials_tpu.graph)
  L4 io        -> .mtx/.smtx/binary loaders       (essentials_tpu.io)
  L5 frontier  -> dense boolmap + index frontiers (essentials_tpu.frontier)
  L6 operators -> advance/filter/for/uniquify/
                  neighborreduce/batch            (essentials_tpu.ops)
  L7 framework -> Problem/Enactor superstep loop  (essentials_tpu.framework)
  L8 algorithms-> bfs/sssp/pr/ppr/bc/color/kcore/
                  mst/tc/hits/geo/spmv/spgemm     (essentials_tpu.algorithms)
  L9 harness   -> CLI, bench, tests               (essentials_tpu.cli, bench/)

Parallel scale-out (absent in the reference; first-class here):
  essentials_tpu.parallel — vertex 1-D partitions, shard_map supersteps,
  all_gather frontier exchange, psum convergence.
"""

__version__ = "0.1.0"

import os as _os


def _enable_xla_cache():
    """Persistent XLA compilation cache (analogous to the route-plan disk
    cache): first compiles of the big fused superstep programs cost 20-40 s
    on TPU; cached reloads are ~instant across processes."""
    try:
        import jax
        d = _os.environ.get(
            "ESSENTIALS_TPU_XLA_CACHE",
            _os.path.join(_os.path.expanduser("~"), ".cache",
                          "essentials_tpu", "xla"))
        if d and d != "0":
            _os.makedirs(d, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", d)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_xla_cache()

from essentials_tpu import formats, graph, io, ops, frontier, framework
from essentials_tpu import algorithms, parallel, utils
from essentials_tpu.graph import Graph, build_graph
from essentials_tpu.errors import EssentialsError, throw_if

__all__ = [
    "formats", "graph", "io", "ops", "frontier", "framework", "algorithms",
    "parallel", "utils", "Graph", "build_graph", "EssentialsError", "throw_if",
]
