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


def a2a_sharded_lookup(
    local_table: jnp.ndarray,
    idx_local: jnp.ndarray,
    axis_name: str,
    n_shards: int,
    capacity: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """All-to-all lookup exchange on a row-sharded table (survey §5's
    "all_to_all / ragged_all_to_all sharded-table lookup exchange").

    Where `sharded_lookup` psums FULL [B, d] partial rows across the
    axis (every device moves B*d bytes), this routes each id to the one
    shard that owns its row and ships only the requested rows back:

        bucket ids by owner shard  ->  all_to_all [S, C] id requests
        -> local gather of my rows ->  all_to_all [S, C, d] responses
        -> unpermute into batch order

    Per-device traffic is O(B/S * d) — S× less than the psum form —
    at the price of a STATIC per-bucket `capacity` C (XLA needs fixed
    shapes; ids beyond capacity return zero rows). Returns
    (rows [B_loc, d], overflow count): size capacity from offline batch
    stats (uniform ids need ~B_loc/S; power-law id streams more) and
    alarm on overflow > 0. Differentiable in `local_table` (the
    all_to_alls are self-transposing, the local gather transposes to a
    shard-local scatter-add).

    `idx_local` is THIS shard's slice of the batch ([B/S] ids, batch
    split over the same axis as the table — the idiomatic TPU embedding
    exchange, cf. the psum form for replicated small batches).
    """
    rows_per_shard = local_table.shape[0]
    b_loc = idx_local.shape[0]
    dest = jnp.clip(idx_local // rows_per_shard, 0, n_shards - 1)  # [B]
    # slot of each id inside its destination bucket
    onehot = dest[:, None] == jnp.arange(n_shards)[None, :]  # [B, S]
    pos = jnp.cumsum(onehot, axis=0) - 1  # [B, S]
    slot = jnp.take_along_axis(pos, dest[:, None], axis=1)[:, 0]  # [B]
    ok = slot < capacity
    overflow = jax.lax.psum(jnp.sum(~ok), axis_name)  # replicated alarm

    send_ids = jnp.full((n_shards, capacity), -1, jnp.int32)
    send_ids = send_ids.at[dest, slot].set(
        jnp.where(ok, idx_local.astype(jnp.int32), -1), mode="drop"
    )
    # requests for MY rows, one [1, C] tile from each source shard
    recv_ids = jax.lax.all_to_all(
        send_ids, axis_name, split_axis=0, concat_axis=0, tiled=True
    )
    my_offset = jax.lax.axis_index(axis_name) * rows_per_shard
    local_idx = recv_ids - my_offset
    valid = (local_idx >= 0) & (local_idx < rows_per_shard) & (recv_ids >= 0)
    gathered = jnp.where(
        valid[..., None],
        local_table[jnp.clip(local_idx, 0, rows_per_shard - 1)],
        0.0,
    )  # [S, C, d]
    # ship rows back: response bucket s holds rows served by shard s
    back = jax.lax.all_to_all(
        gathered, axis_name, split_axis=0, concat_axis=0, tiled=True
    )
    out = back[dest, slot] * ok[:, None].astype(back.dtype)
    return out.reshape(b_loc, local_table.shape[1]), overflow


def spmd_a2a_lookup(
    table: jnp.ndarray, idx: jnp.ndarray, mesh, capacity_factor: float = 2.0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """`table[idx]` as the all_to_all exchange under jit/GSPMD: the
    batch is split over the model axis (each shard routes B/S ids), the
    table stays row-sharded. Returns (rows [B, d], overflow count).

    Requires B and the table rows to divide the model-axis size; pad
    the batch if needed. capacity = ceil(B/S^2 * factor) — factor 2
    covers uniform id streams, raise it for skewed ones (check the
    overflow output in tests/canaries).
    """
    from jax.sharding import PartitionSpec as P

    n_shards = int(mesh.shape[MODEL_AXIS])
    b = idx.shape[0]
    capacity = max(-(-b // (n_shards * n_shards)) * capacity_factor, 8)
    capacity = int(-(-capacity // 8) * 8)

    fn = jax.shard_map(
        lambda t, i: a2a_sharded_lookup(t, i, MODEL_AXIS, n_shards, capacity),
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(MODEL_AXIS)),
        out_specs=(P(MODEL_AXIS), P()),
    )
    rows, overflow = fn(table, idx)
    return rows, overflow


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
