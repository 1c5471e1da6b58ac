"""Sorted segment-combine primitive shared by advance/neighborreduce."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from essentials_tpu.ops.configs import Combine


def combine_identity(combine: Combine, dtype):
    dt = jnp.dtype(dtype)
    if combine == Combine.SUM:
        return dt.type(0)
    if combine == Combine.OR:
        return False
    if combine == Combine.AND:
        return True
    if combine == Combine.MIN:
        return dt.type(jnp.inf) if jnp.issubdtype(dt, jnp.floating) else jnp.iinfo(dt).max
    if combine == Combine.MAX:
        return dt.type(-jnp.inf) if jnp.issubdtype(dt, jnp.floating) else jnp.iinfo(dt).min
    raise ValueError(combine)


def segment_combine(data: jax.Array, segment_ids: jax.Array, num_segments: int,
                    combine: Combine, *, indices_are_sorted: bool = True) -> jax.Array:
    """Deterministic segmented reduction (XLA scatter-reduce / segmented scan)."""
    kw = dict(num_segments=num_segments, indices_are_sorted=indices_are_sorted)
    if combine == Combine.SUM:
        return jax.ops.segment_sum(data, segment_ids, **kw)
    if combine == Combine.MIN:
        return jax.ops.segment_min(data, segment_ids, **kw)
    if combine == Combine.MAX:
        return jax.ops.segment_max(data, segment_ids, **kw)
    if combine == Combine.OR:
        out = jax.ops.segment_max(data.astype(jnp.int8), segment_ids, **kw)
        return out > 0
    if combine == Combine.AND:
        out = jax.ops.segment_min(data.astype(jnp.int8), segment_ids, **kw)
        return out > 0
    raise ValueError(combine)
