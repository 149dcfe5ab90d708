"""Sharded full-catalog scoring + distributed top-k.

Replaces the reference's per-user host loop (survey 3.3) at multi-chip
scale: the item table is row-sharded over the model axis, each shard
scores its item slice and computes a local top-k, then k*S candidates
are all-gathered and merged — communication O(B * k * S), never the
full [B, I] score matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.topk import NEG_INF
from .mesh import MODEL_AXIS


def sharded_user_topk(
    mesh: Mesh,
    user_emb: jnp.ndarray,  # [B, d] replicated
    item_emb: jnp.ndarray,  # [I, d] row-sharded over MODEL_AXIS
    rated_pad: jnp.ndarray,  # [B, max_deg] global item ids (replicated)
    k: int,
):
    """Top-k item ids+scores per user across the item shards."""
    n_items = item_emb.shape[0]
    shards = mesh.shape[MODEL_AXIS]
    if n_items % shards:
        pad = shards - n_items % shards
        item_emb = jnp.pad(item_emb, ((0, pad), (0, 0)))
    rows_per_shard = item_emb.shape[0] // shards

    def body(u_loc, i_loc, rated_loc):
        shard = jax.lax.axis_index(MODEL_AXIS)
        offset = shard * rows_per_shard
        scores = jnp.dot(u_loc, i_loc.T, precision="highest")  # [B, I/S]
        # pad rows (global id >= n_items) can never be retrieved
        glob_cols = offset + jnp.arange(rows_per_shard)
        scores = jnp.where(glob_cols[None, :] < n_items, scores, NEG_INF)
        # mask rated items that fall in this shard
        local_rated = rated_loc - offset
        ok = (local_rated >= 0) & (local_rated < rows_per_shard)
        cols = jnp.where(ok, local_rated, rows_per_shard)
        b = scores.shape[0]
        rows = jnp.broadcast_to(jnp.arange(b)[:, None], cols.shape)
        scores = scores.at[rows, cols].set(NEG_INF, mode="drop")
        loc_val, loc_idx = jax.lax.top_k(scores, k)
        glob_idx = loc_idx + offset
        all_val = jax.lax.all_gather(loc_val, MODEL_AXIS, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(glob_idx, MODEL_AXIS, axis=1, tiled=True)
        m_val, m_pos = jax.lax.top_k(all_val, k)
        m_idx = jnp.take_along_axis(all_idx, m_pos, axis=1)
        return m_val, m_idx

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None), P()),
        out_specs=(P(), P()),
        # outputs ARE replicated over the model axis after the
        # all_gather + merge, but the static varying-axes analysis
        # cannot prove it through top_k
        check_vma=False,
    )
    return fn(user_emb, item_emb, rated_pad)
