"""Uniquify: frontier deduplication.

Reference parity: operators::uniquify::execute (unique / unique_copy,
/root/reference/include/gunrock/framework/operators/uniquify/uniquify.hxx:15-74).
A dense boolmap frontier cannot contain duplicates, so uniquify is the
identity — kept for API parity and for index-list frontiers, where it
sorts + deduplicates into boolmap form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniquify(frontier: jax.Array, *, capacity: int | None = None) -> jax.Array:
    """Boolmap in -> same boolmap out (already duplicate-free).

    Index-list in (int dtype) -> boolmap of size ``capacity`` with duplicates
    and negative/pad entries dropped.
    """
    if frontier.dtype == jnp.bool_:
        return frontier
    assert capacity is not None, "uniquify of an index list needs capacity"
    valid = frontier >= 0
    return jnp.zeros(capacity, dtype=jnp.bool_).at[
        jnp.where(valid, frontier, 0)].max(valid)
