"""Training losses — bit-parity with reference `util/loss_torch.py`.

Every formula keeps the reference's quirks deliberately (survey 7.4):
`bpr_loss` adds 1e-5 inside the log (util/loss_torch.py:5-9) and
`l2_reg_loss` sums UN-squared L2 norms (util/loss_torch.py:17-21).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bpr_loss(user_emb: jnp.ndarray, pos_emb: jnp.ndarray, neg_emb: jnp.ndarray) -> jnp.ndarray:
    """-log(1e-5 + sigmoid(pos - neg)), mean (util/loss_torch.py:5-9).

    The reference's `10e-6` literal == 1e-5.
    """
    pos_score = jnp.sum(user_emb * pos_emb, axis=1)
    neg_score = jnp.sum(user_emb * neg_emb, axis=1)
    return -jnp.mean(jnp.log(1e-5 + jax.nn.sigmoid(pos_score - neg_score)))


def triplet_loss(user_emb: jnp.ndarray, pos_emb: jnp.ndarray, neg_emb: jnp.ndarray) -> jnp.ndarray:
    """Hinge triplet (util/loss_torch.py:11-15)."""
    pos_score = jnp.sum(user_emb * pos_emb, axis=1)
    neg_score = jnp.sum(user_emb * neg_emb, axis=1)
    return jnp.mean(jax.nn.relu(neg_score + 1.0 - pos_score))


def l2_reg_loss(reg: float, *embs: jnp.ndarray) -> jnp.ndarray:
    """reg * sum_i ||E_i||_2 — NOT squared (util/loss_torch.py:17-21)."""
    total = 0.0
    for e in embs:
        total = total + jnp.sqrt(jnp.sum(jnp.square(e)) + 1e-24)
    return reg * total


def l2_reg_loss_sq(reg: float, *embs: jnp.ndarray) -> jnp.ndarray:
    """Conventional squared-L2 variant (used by SHT's calcRegLoss, SHT.py:236)."""
    total = 0.0
    for e in embs:
        total = total + jnp.sum(jnp.square(e))
    return reg * total


def _l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    # Matches torch F.normalize(p=2, dim=1) (clamp_min on the norm) but
    # written as x * rsqrt(sum_sq + eps^2) so the gradient at x == 0 is
    # zero instead of NaN (jnp.linalg.norm has a NaN grad at the origin).
    sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps * eps))


def info_nce(view1: jnp.ndarray, view2: jnp.ndarray, temperature: float, b_cos: bool = True) -> jnp.ndarray:
    """InfoNCE over paired rows (util/loss_torch.py:32-40)."""
    if b_cos:
        view1, view2 = _l2_normalize(view1), _l2_normalize(view2)
    pos_score = jnp.exp(jnp.sum(view1 * view2, axis=-1) / temperature)
    ttl_score = jnp.sum(jnp.exp(view1 @ view2.T / temperature), axis=1)
    return -jnp.mean(jnp.log(pos_score / ttl_score + 1e-5))


def batch_softmax_loss(user_emb: jnp.ndarray, item_emb: jnp.ndarray, temperature: float) -> jnp.ndarray:
    """util/loss_torch.py:23-30."""
    return info_nce(user_emb, item_emb, temperature, b_cos=True)


def contrast_loss(embeds1: jnp.ndarray, embeds2: jnp.ndarray, nodes: jnp.ndarray, temp: float) -> jnp.ndarray:
    """HCCF-style contrastive loss over picked nodes (util/loss_torch.py:103-110).

    embeds are +1e-8 shifted then row-normalized, exactly as the reference.
    `nodes` may contain repeats; callers pass de-duplicated ids (the
    reference uses torch.unique, KHGRec.py:370).
    """
    e1 = _l2_normalize(embeds1 + 1e-8)
    e2 = _l2_normalize(embeds2 + 1e-8)
    p1 = e1[nodes]
    p2 = e2[nodes]
    nume = jnp.exp(jnp.sum(p1 * p2, axis=-1) / temp)
    deno = jnp.sum(jnp.exp(p1 @ p2.T / temp), axis=-1) + 1e-8
    return -jnp.mean(jnp.log(nume / deno))


def contrast_loss_masked(
    embeds1: jnp.ndarray, embeds2: jnp.ndarray, nodes: jnp.ndarray, valid: jnp.ndarray, temp: float
) -> jnp.ndarray:
    """contrast_loss with a static-shape validity mask over `nodes`.

    On TPU we cannot use data-dependent `unique` shapes; instead callers
    pass a fixed-size node buffer plus a boolean mask of live entries
    (duplicates masked off). Padded rows are excluded from numerator mean
    and from the denominator's contrast set.
    """
    e1 = _l2_normalize(embeds1 + 1e-8)
    e2 = _l2_normalize(embeds2 + 1e-8)
    p1 = e1[nodes]
    p2 = e2[nodes]
    nume = jnp.exp(jnp.sum(p1 * p2, axis=-1) / temp)
    logits = p1 @ p2.T / temp
    expd = jnp.exp(logits) * valid[None, :].astype(logits.dtype)
    deno = jnp.sum(expd, axis=-1) + 1e-8
    per = -jnp.log(nume / deno)
    vf = valid.astype(per.dtype)
    return jnp.sum(per * vf) / jnp.maximum(jnp.sum(vf), 1.0)


def contrast_loss_pregathered(
    p1_raw: jnp.ndarray, p2_raw: jnp.ndarray, valid: jnp.ndarray, temp: float
) -> jnp.ndarray:
    """contrast_loss_masked on PRE-GATHERED rows (p_raw = embeds[nodes]).

    Row-normalisation commutes with the gather, so callers can merge
    several node lookups into one gather (one backward scatter) and
    normalise only the picked rows instead of the full embedding
    arrays; numerics are identical to contrast_loss_masked.
    """
    p1 = _l2_normalize(p1_raw + 1e-8)
    p2 = _l2_normalize(p2_raw + 1e-8)
    nume = jnp.exp(jnp.sum(p1 * p2, axis=-1) / temp)
    logits = p1 @ p2.T / temp
    expd = jnp.exp(logits) * valid[None, :].astype(logits.dtype)
    deno = jnp.sum(expd, axis=-1) + 1e-8
    per = -jnp.log(nume / deno)
    vf = valid.astype(per.dtype)
    return jnp.sum(per * vf) / jnp.maximum(jnp.sum(vf), 1.0)


def unique_mask(ids: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Static-shape `torch.unique` stand-in: sorted ids + first-occurrence
    mask. Downstream losses treat masked-off rows as absent, matching the
    reference's unique() semantics without dynamic shapes (survey 7.3)."""
    s = jnp.sort(ids)
    first = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    return s, first


def info_nce_masked(
    view1: jnp.ndarray, view2: jnp.ndarray, valid: jnp.ndarray, temperature: float
) -> jnp.ndarray:
    """InfoNCE over a fixed-size buffer with a validity mask (static-shape
    version of util/loss_torch.py:32-40 applied to unique-picked rows)."""
    v1, v2 = _l2_normalize(view1), _l2_normalize(view2)
    pos_score = jnp.exp(jnp.sum(v1 * v2, axis=-1) / temperature)
    logits = jnp.exp(v1 @ v2.T / temperature) * valid[None, :].astype(view1.dtype)
    ttl = jnp.sum(logits, axis=1)
    per = -jnp.log(pos_score / ttl + 1e-5)
    vf = valid.astype(per.dtype)
    return jnp.sum(per * vf) / jnp.maximum(jnp.sum(vf), 1.0)


def kl_divergence(p_logit: jnp.ndarray, q_logit: jnp.ndarray) -> jnp.ndarray:
    """util/loss_torch.py:43-46."""
    p = jax.nn.softmax(p_logit, axis=-1)
    kl = jnp.sum(p * (jax.nn.log_softmax(p_logit, axis=-1) - jax.nn.log_softmax(q_logit, axis=-1)), axis=1)
    return jnp.mean(kl)


def js_divergence(p_logit: jnp.ndarray, q_logit: jnp.ndarray) -> jnp.ndarray:
    """util/loss_torch.py:48-53."""
    return kl_divergence(p_logit, q_logit) + kl_divergence(q_logit, p_logit)


def l2_loss_mean(x: jnp.ndarray) -> jnp.ndarray:
    """TransR regulariser: mean of row sum-of-squares / 2 (util/loss_torch.py:112-113)."""
    return jnp.mean(jnp.sum(jnp.square(x), axis=1) / 2.0)


def transr_kg_loss(
    h_emb: jnp.ndarray,
    r_emb: jnp.ndarray,
    w_r: jnp.ndarray,
    pos_t_emb: jnp.ndarray,
    neg_t_emb: jnp.ndarray,
    reg_kg: float,
    batch_size_kg: int,
) -> jnp.ndarray:
    """TransR-style KG loss (reference KHGRec.py:347-365 / KGAT.py:305-330).

    w_r: per-triple projection [B, d, dr] (gathered by relation id).
    loss = mean(-logsigmoid(||h+r-t_neg||^2 - ||h+r-t_pos||^2))
           + l2_reg_loss(reg_kg, projections...) / batch_size_kg
    """
    r_mul_h = jnp.einsum("bd,bdr->br", h_emb, w_r)
    r_mul_pos = jnp.einsum("bd,bdr->br", pos_t_emb, w_r)
    r_mul_neg = jnp.einsum("bd,bdr->br", neg_t_emb, w_r)
    pos_score = jnp.sum(jnp.square(r_mul_h + r_emb - r_mul_pos), axis=1)
    neg_score = jnp.sum(jnp.square(r_mul_h + r_emb - r_mul_neg), axis=1)
    kg_loss = jnp.mean(-jax.nn.log_sigmoid(neg_score - pos_score))
    reg = l2_reg_loss(reg_kg, r_mul_h, r_emb, r_mul_pos, r_mul_neg) / batch_size_kg
    return kg_loss + reg
