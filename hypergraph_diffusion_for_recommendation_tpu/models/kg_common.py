"""Shared knowledge-graph ops for the KGAT/KHGRec family.

TPU-native forms of the reference's per-relation Python loops + CPU
sparse-softmax round trips (KGAT.py:349-389, KHGRec.py:298-331, survey
2.9): relation-batched projections run as R stacked MXU matmuls, and
the attention row-softmax is a device segment-softmax over the triple
list.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.sparse import segment_softmax


def project_by_relation(x: jnp.ndarray, w: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """x[b] @ w[r[b]] without materialising per-row W gathers.

    x: [B, d]; w: [R, d, dr]; r: [B] -> [B, dr]. Computes all R
    projections as one einsum (R small: MXU-efficient), then selects per
    row with a one-hot contraction — replaces torch.bmm over gathered
    W_r (KGAT.py:330-334). The one-hot einsum stays on the MXU; the
    earlier take_along_axis select lowered to a slow batched gather
    (1.4 ms -> MXU-bound at bench shapes, scripts/profile_khgrec.py).
    """
    all_proj = jnp.einsum("bd,rdk->rbk", x, w)  # [R, B, dr]
    onehot = jax.nn.one_hot(r, w.shape[0], dtype=x.dtype)  # [B, R]
    return jnp.einsum("rbk,br->bk", all_proj, onehot)


def relation_lookup(rel_emb: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """rel_emb[r] as a one-hot MXU contraction (R ~ 10 relations).

    The matmul form keeps the op inside the surrounding XLA fusion and
    its VJP is a transposed MXU matmul instead of an unsorted
    scatter-add into the relation table.
    """
    onehot = jax.nn.one_hot(r, rel_emb.shape[0], dtype=rel_emb.dtype)
    return onehot @ rel_emb


def attention_values(
    entity_emb: jnp.ndarray,
    rel_emb: jnp.ndarray,
    trans_m: jnp.ndarray,
    h: jnp.ndarray,
    t: jnp.ndarray,
    r: jnp.ndarray,
) -> jnp.ndarray:
    """KGAT attention logits per triple (Equation 4, KGAT.py:349-360):
    v = sum((t W_r) * tanh(h W_r + r), -1)."""
    n = entity_emb.shape[0]
    # ONE merged h+t gather (one backward scatter) and one batched
    # projection for both operands (same relation vector)
    ht = entity_emb[jnp.clip(jnp.concatenate([h, t]), 0, n - 1)]
    both = project_by_relation(ht, trans_m, jnp.concatenate([r, r]))
    r_mul_h, r_mul_t = jnp.split(both, 2, axis=0)
    return jnp.sum(r_mul_t * jnp.tanh(r_mul_h + relation_lookup(rel_emb, r)), axis=1)


def attention_softmax(
    values: jnp.ndarray, h: jnp.ndarray, n_entities: int, valid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Row-softmax of the attention adjacency (Equation 5) — on-device
    segment softmax instead of torch.sparse.softmax on CPU (KGAT.py:388)."""
    return segment_softmax(values, h, n_entities, valid)


def att_matvec(
    h: jnp.ndarray, t: jnp.ndarray, vals: jnp.ndarray, x: jnp.ndarray, n: int
) -> jnp.ndarray:
    """(A_att @ X)[i] = sum_{(i,t)} vals * X[t] over the triple list."""
    gathered = x[jnp.clip(t, 0, n - 1)] * vals[:, None]
    return jax.ops.segment_sum(gathered, h, num_segments=n)


def att_matvec_t(
    h: jnp.ndarray, t: jnp.ndarray, vals: jnp.ndarray, x: jnp.ndarray, n: int
) -> jnp.ndarray:
    """A_att^T @ X over the same triple list."""
    gathered = x[jnp.clip(h, 0, n - 1)] * vals[:, None]
    return jax.ops.segment_sum(gathered, t, num_segments=n)
