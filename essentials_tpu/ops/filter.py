"""Filter: predicate-driven frontier restriction.

Reference parity: operators::filter::execute with its four strategies
(bypass/predicated/remove/compact,
/root/reference/include/gunrock/framework/operators/filter/filter.hxx:59-152).
With dense boolmap frontiers, all four collapse to one masked AND — there is
nothing to compact and "bypass"'s in-place invalid-marking is the natural
representation already.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from essentials_tpu.graph.graph import Graph


def filter_frontier(g: Graph, frontier: jax.Array, predicate: Callable,
                    kind: str = "vertex") -> jax.Array:
    """Keep active elements where ``predicate(ids) -> bool`` holds.

    ``predicate`` receives the full id vector ([Vp] or [Ep]) and must return a
    boolean vector; it is only *observed* at active slots.
    """
    n = frontier.shape[0]
    ids = jnp.arange(n, dtype=jnp.int32)
    keep = predicate(ids)
    out = frontier & keep
    valid = g.vertex_mask() if kind == "vertex" else g.edge_mask()
    return out & valid
