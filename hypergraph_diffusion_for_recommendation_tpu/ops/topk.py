"""Top-K retrieval kernels.

Replaces the reference's per-user device→host round-trip + numba
insertion sort (`find_k_largest`, util/algorithm.py:143-173, called from
base/main_recommender.py:64-100 once PER USER). Here scoring, rated-item
masking, and top-k all run on device over user blocks; the distributed
variant merges per-item-shard candidates with one all_gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # reference masks rated items with -10e8 (base/main_recommender.py:88)


def mask_rated(scores: jnp.ndarray, rated_pad: jnp.ndarray) -> jnp.ndarray:
    """Scatter NEG_INF into each user's already-rated item slots.

    scores: [B, I]; rated_pad: [B, max_deg] item ids, pad = -1 (pad slots
    are out of range and dropped by scatter `mode='drop'`).
    """
    b = scores.shape[0]
    rows = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], rated_pad.shape)
    cols = jnp.where(rated_pad >= 0, rated_pad, scores.shape[1])  # OOB -> dropped
    return scores.at[rows, cols].set(NEG_INF, mode="drop")


def topk_ids(scores: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """lax.top_k over the item axis: ([B, I]) -> values, ids each [B, k]."""
    return jax.lax.top_k(scores, k)


def masked_topk(
    scores: jnp.ndarray, rated_pad: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    return topk_ids(mask_rated(scores, rated_pad), k)


def distributed_topk(
    local_scores: jnp.ndarray,
    k: int,
    axis_name: str,
    item_shard_offset: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k across an item axis sharded over `axis_name` (shard_map body).

    Each shard computes its local top-k over its item slice, converts ids
    to global ids via its offset, all-gathers k*n_shards candidates, and
    re-runs top-k on the merged (tiny) candidate set. Communication is
    O(B * k * n_shards) instead of O(B * I).
    """
    loc_vals, loc_ids = jax.lax.top_k(local_scores, k)
    glob_ids = loc_ids + item_shard_offset
    all_vals = jax.lax.all_gather(loc_vals, axis_name, axis=1, tiled=True)
    all_ids = jax.lax.all_gather(glob_ids, axis_name, axis=1, tiled=True)
    m_vals, m_pos = jax.lax.top_k(all_vals, k)
    m_ids = jnp.take_along_axis(all_ids, m_pos, axis=1)
    return m_vals, m_ids
