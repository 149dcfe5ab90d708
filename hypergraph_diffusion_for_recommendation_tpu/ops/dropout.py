"""Stateless, shape-preserving edge dropout.

Replaces the reference's `SpAdjDropEdge` (KHGRec.py:482-495, duplicated
~8x), which FILTERS indices — a dynamic-shape op that cannot live under
jit. Here we zero the dropped values and rescale survivors by 1/keep
(inverted dropout on the nnz axis). The matrix-vector product result is
distributionally identical; shapes stay static (survey 7.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import SparseCOO, with_new_vals


def hash_keep_mask(rng: jax.Array, ids: jnp.ndarray, keep_rate: float) -> jnp.ndarray:
    """Counter-based Bernoulli(keep_rate) keep-mask over edge IDS.

    murmur3-finalizer-style avalanche hash of (key, id): deterministic
    per (key, edge id), so every layout of the same edge (fwd, transpose,
    packed pallas blocks) evaluates the SAME draw purely elementwise on
    its own constant id array — no runtime gathers. Statistical quality
    is ample for dropout (full-avalanche finalizer); this is NOT the
    threefry stream used elsewhere.
    """
    kd = jnp.asarray(rng)
    if kd.dtype != jnp.uint32:
        kd = jax.random.key_data(rng)
    kd = kd.reshape(-1).astype(jnp.uint32)
    z = ids.astype(jnp.uint32) ^ kd[0]
    z = z * jnp.uint32(0x9E3779B9)
    z = z ^ (z >> 16)
    z = z * jnp.uint32(0x85EBCA6B)
    z = z ^ kd[-1]
    z = z ^ (z >> 13)
    z = z * jnp.uint32(0xC2B2AE35)
    z = z ^ (z >> 16)
    return (z >> 8).astype(jnp.float32) * (1.0 / (1 << 24)) < keep_rate


def drop_edges(rng: jax.Array, adj: SparseCOO, keep_rate: float) -> SparseCOO:
    """Bernoulli(keep_rate) mask on edge values, rescaled by 1/keep_rate.

    keep_rate is a Python float; keep_rate >= 1 returns adj unchanged
    (mirrors the reference's `if keepRate == 1.0` early-out).
    """
    if keep_rate >= 1.0:
        return adj
    mask = jax.random.bernoulli(rng, keep_rate, adj.vals.shape)
    vals = jnp.where(mask, adj.vals / keep_rate, 0.0)
    return with_new_vals(adj, vals)


def node_dropout_mask(rng: jax.Array, n_nodes: int, drop_rate: float) -> jnp.ndarray:
    """Boolean keep-mask over nodes (GraphAugmentor.node_dropout,
    data/augmentor.py:11-25). Edges touching a dropped node are zeroed."""
    return jax.random.bernoulli(rng, 1.0 - drop_rate, (n_nodes,))


def drop_edges_by_nodes(rng: jax.Array, adj: SparseCOO, drop_rate: float) -> SparseCOO:
    """Node-dropout view of a graph: zero every edge incident to a dropped
    node (no rescale — parity with data/augmentor.py:11-25)."""
    if drop_rate <= 0.0:
        return adj
    k1, k2 = jax.random.split(rng)
    keep_rows = node_dropout_mask(k1, adj.nrows, drop_rate)
    keep_cols = node_dropout_mask(k2, adj.ncols, drop_rate)
    rows_ok = keep_rows[jnp.clip(adj.rows, 0, adj.nrows - 1)]
    cols_ok = keep_cols[jnp.clip(adj.cols, 0, adj.ncols - 1)]
    vals = jnp.where(rows_ok & cols_ok, adj.vals, 0.0)
    return with_new_vals(adj, vals)
