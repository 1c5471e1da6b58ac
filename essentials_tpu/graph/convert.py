"""Offsets <-> indices conversions (device-side).

Reference parity: graph/conversions/convert.hxx:18-66
(offsets_to_indices via fill+scatter+inclusive-scan-max, indices_to_offsets
via vectorized lower_bound). Same telescoping-cumsum machinery as the
segment engine — no arbitrary gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def offsets_to_indices(offsets: jax.Array, n_elements: int) -> jax.Array:
    """[S+1] offsets -> [n_elements] segment id per element.

    offsets_to_indices([0,0,2,4], 4) == [1,1,2,2] (wait: segment 1 owns
    elements [0,2), segment 2 owns [2,4)) — matches the reference semantics
    of expanding row offsets to row indices.
    """
    ids = jnp.arange(offsets.shape[0] - 1, dtype=jnp.int32)
    d = jnp.diff(ids, prepend=jnp.zeros(1, jnp.int32))
    z = jnp.zeros(n_elements + 1, jnp.int32).at[offsets[:-1]].add(d)
    return jnp.cumsum(z)[:n_elements]


def indices_to_offsets(indices: jax.Array, n_segments: int) -> jax.Array:
    """Sorted [N] segment ids -> [n_segments+1] offsets (vectorized
    searchsorted, reference parity with the thrust lower_bound version)."""
    seg = jnp.arange(n_segments + 1, dtype=indices.dtype)
    return jnp.searchsorted(indices, seg, side="left").astype(jnp.int32)
