"""Row-sharded embedding table with explicit collective lookup.

GSPMD can auto-partition `table[idx]`, but for large tables the
default strategy all-gathers the table. This module provides the
explicit TPU-native pattern (survey 2.8): each model-axis shard holds a
contiguous row block; a lookup gathers locally with OOB masking and
psums the partial rows across the axis — communication is O(B * d)
instead of O(E * d).

Used inside shard_map bodies; `sharded_lookup` is the building block
for the multi-host embedding engine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .mesh import MODEL_AXIS


def sharded_lookup(local_table: jnp.ndarray, idx: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Lookup rows of a row-sharded table inside shard_map.

    local_table: [E/S, d] — this shard's contiguous row block;
    idx: [B] global row ids (replicated across the axis);
    returns [B, d] — full rows, identical on every shard (psum).
    """
    shard = jax.lax.axis_index(axis_name)
    rows_per_shard = local_table.shape[0]
    offset = shard * rows_per_shard
    local_idx = idx - offset
    in_range = (local_idx >= 0) & (local_idx < rows_per_shard)
    safe_idx = jnp.clip(local_idx, 0, rows_per_shard - 1)
    partial = jnp.where(in_range[:, None], local_table[safe_idx], 0.0)
    return jax.lax.psum(partial, axis_name)


def spmd_sharded_lookup(table: jnp.ndarray, idx: jnp.ndarray, mesh) -> jnp.ndarray:
    """Explicit-collective `table[idx]` usable inside a jit/GSPMD-traced
    function (e.g. a model forward under Trainer(mesh=...)).

    shard_map PINS the schedule — each model-axis shard gathers from its
    own row block and the partial rows are psum'd over ICI — instead of
    leaving the partitioner free to all-gather the table (O(E*d) per
    step vs O(B*d)). The table's row count must divide the model axis;
    grads flow through (psum transposes to identity, the local gather
    transposes to a shard-local scatter-add).
    """
    from jax.sharding import PartitionSpec as P

    fn = jax.shard_map(
        lambda t, i: sharded_lookup(t, i, MODEL_AXIS),
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P()),
        out_specs=P(),
    )
    return fn(table, idx)


def sharded_scatter_add(
    local_table: jnp.ndarray, idx: jnp.ndarray, updates: jnp.ndarray, axis_name: str
) -> jnp.ndarray:
    """Scatter-add [B, d] updates into a row-sharded table (the backward
    of `sharded_lookup`): each shard keeps only its rows' updates."""
    shard = jax.lax.axis_index(axis_name)
    rows_per_shard = local_table.shape[0]
    offset = shard * rows_per_shard
    local_idx = idx - offset
    in_range = (local_idx >= 0) & (local_idx < rows_per_shard)
    safe_idx = jnp.where(in_range, local_idx, rows_per_shard)  # OOB -> dropped
    return local_table.at[safe_idx].add(
        jnp.where(in_range[:, None], updates, 0.0), mode="drop"
    )
