"""Problem: algorithm data-slice conventions (OO wrapper over the
functional core).

Reference parity: problem_t (/root/reference/include/gunrock/framework/
problem.hxx:29-59) — holds the graph plus per-algorithm state, with
init()/reset(). In the functional design, per-algorithm state is an
immutable pytree (NamedTuple/dataclass) produced by the algorithm's
`init(graph, param)` and threaded through the superstep; this class wraps
that shape for users who prefer the reference's object-oriented API:

    problem = BfsProblem(graph, source=0)
    result = problem.enact()          # EnactResult; state in result.state

Subclasses provide `init()` (build the state pytree) and `step_fn()` /
`converged_fn()` returning the superstep functions — top-level functions
from the algorithm module, so the enactor's jit cache keys stay stable —
mirroring problem_t::init/reset + enactor_t::loop.
"""

from __future__ import annotations

from essentials_tpu.graph.graph import Graph


class Problem:
    """OO wrapper: subclass, implement init()/step_fn()/converged_fn();
    `enact()` drives the compiled loop."""

    def __init__(self, graph: Graph, **params):
        self.graph = graph
        self.params = params

    def init(self):
        raise NotImplementedError

    def step_fn(self):
        """(graph, state, iteration) -> state."""
        raise NotImplementedError

    def converged_fn(self):
        """(graph, state, iteration) -> bool; None = default (empty
        frontier, enactor.hxx:294-296)."""
        return None

    def reset(self):
        """Reference problem_t::reset(): rebuild the state for a fresh run
        (functional state is immutable, so reset == init)."""
        return self.init()

    def enact(self, *, max_iterations: int | None = None,
              warmup: bool = True):
        from essentials_tpu.framework.enactor import enact
        max_it = (max_iterations if max_iterations is not None
                  else self.graph.n_vertices + 1)
        return enact(self.step_fn(), self.converged_fn(), self.graph,
                     self.init(), max_iterations=max_it, warmup=warmup)


class BfsProblem(Problem):
    """BFS expressed through the Problem API (the reference's
    bfs::problem_t shape, algorithms/bfs.hxx:29-108)."""

    def init(self):
        from essentials_tpu.algorithms import bfs
        return bfs.init(self.graph, self.params["source"])

    def step_fn(self):
        from essentials_tpu.algorithms import bfs
        return bfs.step


class SsspProblem(Problem):
    """SSSP through the Problem API (sssp.hxx:29-108 shape)."""

    def init(self):
        from essentials_tpu.algorithms import sssp
        return sssp.init(self.graph, self.params["source"])

    def step_fn(self):
        from essentials_tpu.algorithms import sssp
        return sssp.step
