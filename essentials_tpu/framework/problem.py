"""Problem: algorithm data-slice conventions.

Reference parity: problem_t (/root/reference/include/gunrock/framework/
problem.hxx:29-59) — holds the graph plus per-algorithm state, with
init()/reset(). In the functional design, per-algorithm state is an immutable
pytree (NamedTuple/dataclass) produced by the algorithm's `init(graph, param)`
and threaded through the superstep; this base class exists for users who
prefer the reference's object-oriented shape.
"""

from __future__ import annotations

from essentials_tpu.graph.graph import Graph


class Problem:
    """Optional OO wrapper: subclass, implement init()/reset() returning the
    state pytree; `essentials_tpu.framework.enact` drives the loop."""

    def __init__(self, graph: Graph, **params):
        self.graph = graph
        self.params = params

    def init(self):
        raise NotImplementedError

    def reset(self):
        return self.init()
