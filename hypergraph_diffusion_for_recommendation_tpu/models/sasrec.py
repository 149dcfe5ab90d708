"""SASRec and CL4SRec — the sequential family.

The reference registers both (main.py:105-108) on the
SequentialRecommender lifecycle (base/seq_recommender.py:11-135) with
the `Sequence` data class, `next_batch_sequence` windows and the
`PointWiseFeedForward` block (util/structure.py:4-18); the model files
themselves were not committed. This is a faithful SASRec:
causal self-attention blocks over 1-based padded item sequences,
learned positional embeddings, per-position BCE with one sampled
negative (the sampler's contract, util/sampler.py:292-320).

CL4SRec adds contrastive learning between two augmented views of each
sequence — crop / item-mask / reorder, mirroring SequenceAugmentor
(data/augmentor.py:66-97) — with InfoNCE over the final-position
representations. All three augmentations are static-shape on-device
transforms: crop shifts the window to the front with renumbered
positions (item_crop semantics), mask zeroes random live positions
(mask token = pad 0, vs the reference's dedicated mask_idx — noted
deviation), and reorder shuffles a contiguous window in place via a
key-sort (random sort keys inside the window, position keys outside).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import Config
from ..data.device import CFDeviceData
from ..data.sequence import SeqDeviceData, build_seq_device_data
from ..ops.losses import info_nce
from .base import ModelBundle, register_model


class PointWiseFeedForward(nn.Module):
    """util/structure.py:4-18: Linear-Dropout-ReLU-Linear-Dropout + res."""

    dim: int
    dropout: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Dense(self.dim)(x)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.relu(h)
        h = nn.Dense(self.dim)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return x + h


class SASRecEncoder(nn.Module):
    n_items: int  # 1-based ids 1..n_items; row 0 = padding
    dim: int
    max_len: int
    n_blocks: int = 2
    n_heads: int = 1
    dropout: float = 0.2

    @nn.compact
    def __call__(self, seq, pos, train: bool = False):
        item_emb = self.param(
            "item_emb", nn.initializers.xavier_uniform(), (self.n_items + 1, self.dim)
        )
        pos_emb = self.param(
            "pos_emb", nn.initializers.xavier_uniform(), (self.max_len + 1, self.dim)
        )
        pad_mask = seq > 0  # [B, L]
        x = item_emb[seq] * jnp.sqrt(float(self.dim)) + pos_emb[pos]
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = x * pad_mask[..., None]

        L = seq.shape[1]
        causal = jnp.tril(jnp.ones((L, L), bool))
        attn_mask = causal[None, None] & pad_mask[:, None, None, :]
        for _ in range(self.n_blocks):
            q = nn.LayerNorm()(x)
            a = nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads, qkv_features=self.dim, deterministic=not train,
                dropout_rate=self.dropout,
            )(q, x, mask=attn_mask)
            x = q + a
            x = PointWiseFeedForward(self.dim, self.dropout)(nn.LayerNorm()(x), train)
            x = x * pad_mask[..., None]
        x = nn.LayerNorm()(x)
        return x, item_emb


def _seq_augment(rng, seq, pos, seq_len, n_items,
                 crop_ratio=0.6, mask_ratio=0.3, reorder_ratio=0.3):
    """One CL4SRec view: per row, pick crop / item-mask / reorder
    uniformly (SequenceAugmentor, data/augmentor.py:71-97), each as a
    static-shape device transform."""
    k_choice, k_a, k_b, k_c, k_d = jax.random.split(rng, 5)
    b, max_len = seq.shape
    idx = jnp.arange(max_len)[None, :]
    seq_len = jnp.maximum(seq_len, 1)

    # crop (item_crop): window [start, start+floor(len*ratio)+1) moved to
    # the FRONT with positions renumbered 1..crop_len (augmentor.py:71-81)
    keep_len = (seq_len.astype(jnp.float32) * crop_ratio).astype(jnp.int32)
    crop_len = jnp.minimum(keep_len + 1, seq_len)
    max_start = jnp.maximum(seq_len - keep_len, 1)
    start = (jax.random.uniform(k_a, (b,)) * max_start.astype(jnp.float32)).astype(jnp.int32)
    src = jnp.clip(start[:, None] + idx, 0, max_len - 1)
    shifted = jnp.take_along_axis(seq, src, axis=1)
    cvalid = idx < crop_len[:, None]
    cropped = jnp.where(cvalid, shifted, 0)
    cropped_pos = jnp.where(cvalid, idx + 1, 0)

    # item mask (item_mask): zero floor(len*ratio) random live positions
    # (mask token = pad 0 vs the reference's dedicated mask_idx)
    keep = jax.random.bernoulli(k_b, 1.0 - mask_ratio, seq.shape)
    masked = jnp.where(keep, seq, 0)

    # reorder (item_reorder): shuffle a window of floor(len*ratio)+1 in
    # place — random sort keys inside the window, position keys outside,
    # so argsort permutes only the window and fixes everything else
    w = (seq_len.astype(jnp.float32) * reorder_ratio).astype(jnp.int32) + 1
    rmax_start = jnp.maximum(seq_len - (w - 1), 1)
    rstart = (jax.random.uniform(k_c, (b,)) * rmax_start.astype(jnp.float32)).astype(jnp.int32)
    in_win = (idx >= rstart[:, None]) & (idx < (rstart + w)[:, None]) & (idx < seq_len[:, None])
    rnd = jax.random.uniform(k_d, seq.shape)
    key = jnp.where(in_win, rstart[:, None].astype(jnp.float32) + rnd * w[:, None],
                    idx.astype(jnp.float32))
    perm = jnp.argsort(key, axis=1)
    reordered = jnp.take_along_axis(seq, perm, axis=1)

    choice = jax.random.randint(k_choice, (b,), 0, 3)[:, None]
    out = jnp.where(choice == 0, cropped, jnp.where(choice == 1, masked, reordered))
    out_pos = jnp.where(choice == 0, cropped_pos, pos)
    return out, out_pos


def _build_sasrec_like(name: str, use_cl: bool):
    def builder(cfg: Config, cf: CFDeviceData, kg=None) -> ModelBundle:
        seq_data = build_seq_from_cf(cf)
        module = SASRecEncoder(
            seq_data.n_items, cfg.embedding_size, seq_data.max_len,
            n_blocks=cfg.n_layers, n_heads=1, dropout=cfg.drop_rate,
        )

        def init(rng):
            params = module.init(
                {"params": rng}, seq_data.seq[:2], seq_data.pos[:2]
            )
            return params, ()

        def batch_loss(params, extras, batch, rng):
            seq, pos, y, neg, valid_row = batch
            k_d, k_cl1, k_cl2 = jax.random.split(rng, 3)
            h, item_emb = module.apply(
                params, seq, pos, train=True, rngs={"dropout": k_d}
            )
            pos_logits = jnp.sum(h * item_emb[y], axis=-1)
            neg_logits = jnp.sum(h * item_emb[neg], axis=-1)
            valid = (y > 0) & valid_row[:, None]
            vf = valid.astype(h.dtype)
            bce = -(
                jnp.log(jax.nn.sigmoid(pos_logits) + 1e-24)
                + jnp.log(1.0 - jax.nn.sigmoid(neg_logits) + 1e-24)
            )
            rec = jnp.sum(bce * vf) / jnp.maximum(jnp.sum(vf), 1.0)
            aux = {"rec_loss": rec}
            loss = rec
            if use_cl:
                seq_len = jnp.sum((seq > 0).astype(jnp.int32), axis=1)
                s1, p1 = _seq_augment(k_cl1, seq, pos, seq_len, seq_data.n_items)
                s2, p2 = _seq_augment(k_cl2, seq, pos, seq_len, seq_data.n_items)
                h1, _ = module.apply(params, s1, p1, train=True, rngs={"dropout": k_cl1})
                h2, _ = module.apply(params, s2, p2, train=True, rngs={"dropout": k_cl2})

                def last_rep(h, s):
                    # last NON-EMPTY position of the augmented view (a
                    # crop may remove the original final position)
                    idx = jnp.arange(s.shape[1])[None, :]
                    last = jnp.max(jnp.where(s > 0, idx, -1), axis=1)
                    return h[jnp.arange(h.shape[0]), jnp.maximum(last, 0)]

                r1 = last_rep(h1, s1)
                r2 = last_rep(h2, s2)
                cl = cfg.cl_rate * info_nce(r1, r2, cfg.temp)
                aux["cl_loss"] = cl
                loss = loss + cl
            return loss, aux

        def encode_eval(params, extras):
            h, item_emb = module.apply(params, seq_data.seq, seq_data.pos)
            last = jnp.maximum(seq_data.seq_len - 1, 0)
            reps = h[jnp.arange(h.shape[0]), last]  # [n_seq_pad, d]
            # scatter sequence reps back to dense user rows (users with
            # <2 train items keep a zero representation)
            user_repr = jnp.zeros((cf.n_users, reps.shape[1]), reps.dtype)
            vf = seq_data.seq_valid[:, None].astype(reps.dtype)
            user_repr = user_repr.at[seq_data.seq_user].add(reps * vf)
            return user_repr, item_emb[1:]

        return ModelBundle(
            name=name, cfg=cfg, cf=cf, kg=None, uses_kg=False,
            init=init, batch_loss=batch_loss, encode_eval=encode_eval,
            seq=seq_data, batch_kind="sequence",
        )

    return builder


def build_seq_from_cf(cf: CFDeviceData, max_len: int = 50) -> SeqDeviceData:
    """Reconstruct per-user ordered sequences from the device CF data."""
    import numpy as np

    from ..core.types import pad_to_multiple, padded_rows_from_lists
    from ..data.sequence import SeqDeviceData

    edge_u = np.asarray(cf.edge_u)
    edge_i = np.asarray(cf.edge_i)
    order = np.argsort(edge_u, kind="stable")
    u_sorted = edge_u[order]
    i_sorted = edge_i[order] + 1
    splits = np.searchsorted(u_sorted, np.arange(1, cf.n_users))
    per_user = np.split(i_sorted, splits)

    rows = [(u, items) for u, items in enumerate(per_user) if len(items) >= 2]
    n_seqs = len(rows)
    n_pad = max(pad_to_multiple(max(n_seqs, 1), 8), 8)
    seq = np.zeros((n_pad, max_len), np.int32)
    pos = np.zeros((n_pad, max_len), np.int32)
    y = np.zeros((n_pad, max_len), np.int32)
    seq_len = np.zeros(n_pad, np.int32)
    seq_user = np.zeros(n_pad, np.int32)
    valid = np.zeros(n_pad, bool)
    for k, (u, items) in enumerate(rows):
        window = items[-(max_len + 1):] if len(items) > max_len else items
        end = min(len(window) - 1, max_len)
        seq[k, :end] = window[:-1][:end]
        pos[k, :end] = np.arange(1, end + 1)
        y[k, :end] = window[1:][:end]
        seq_len[k] = end
        seq_user[k] = u
        valid[k] = True

    rated_lists = []
    for items in per_user:
        rated_lists.append(np.asarray(items, np.int32))
    rated_1b = padded_rows_from_lists(rated_lists, fill=-1)

    import jax.numpy as jnp

    return SeqDeviceData(
        seq=jnp.asarray(seq), pos=jnp.asarray(pos), y=jnp.asarray(y),
        seq_len=jnp.asarray(seq_len), seq_valid=jnp.asarray(valid),
        seq_user=jnp.asarray(seq_user), rated_pad_1b=jnp.asarray(rated_1b),
        max_len=max_len, n_items=cf.n_items, n_seqs=n_seqs,
    )


register_model("SASRec")(_build_sasrec_like("SASRec", use_cl=False))
register_model("CL4SRec")(_build_sasrec_like("CL4SRec", use_cl=True))
