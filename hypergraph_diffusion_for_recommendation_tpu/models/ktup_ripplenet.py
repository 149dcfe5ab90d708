"""KTUP and RippleNet (HKGRippleNet) — KG recommenders present in the
reference only as notebooks / registry names (KTUP.ipynb; HKGRippleNet
in main.py:102). Compact TPU-native implementations:

  KTUP       TransH-style joint model: entities projected onto relation
             hyperplanes for the KG loss; CF preferences are soft
             attention mixtures over relations, users translated by
             their preference vector toward items; joint hinge losses.
  RippleNet  per-user multi-hop ripple sets over the KG (precomputed
             padded [U, hops, mem] triples); per-hop attention
             p ∝ softmax(v^T R h), o_h = Σ p · t; score = σ(Σ_h o_h ⋅ v).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import Config
from ..data.device import CFDeviceData, KGDeviceData
from ..ops.losses import l2_reg_loss
from .base import ModelBundle, register_model


class KTUPModule(nn.Module):
    n_users: int
    n_items: int
    n_entities: int
    n_relations: int
    dim: int

    @nn.compact
    def __call__(self, kg: KGDeviceData):
        u = self.param("user_emb", nn.initializers.xavier_uniform(), (self.n_users, self.dim))
        ent = self.param("entity_emb", nn.initializers.xavier_uniform(), (self.n_entities, self.dim))
        rel = self.param("relation_emb", nn.initializers.xavier_uniform(), (self.n_relations, self.dim))
        norm = self.param("relation_norm", nn.initializers.xavier_uniform(), (self.n_relations, self.dim))
        pref = self.param("pref_emb", nn.initializers.xavier_uniform(), (self.n_relations, self.dim))
        return u, ent, rel, norm, pref


def _transh_project(e, w):
    w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
    return e - jnp.sum(e * w, axis=-1, keepdims=True) * w


@register_model("KTUP")
def build_ktup(cfg: Config, cf: CFDeviceData, kg: KGDeviceData) -> ModelBundle:
    assert kg is not None, "KTUP requires knowledge data"
    module = KTUPModule(cf.n_users, cf.n_items, kg.n_entities, kg.n_relations, cfg.embedding_size)

    def init(rng):
        return module.init(rng, kg), ()

    def batch_loss(params, extras, batch, rng):
        users, pos, neg, h, r, pt, nt = batch
        u, ent, rel, norm, pref = module.apply(params, kg)
        item_emb = ent[kg.item_idx]
        ue = u[users]
        # soft preference: attention over relations (KTUP eq. 5-6)
        att = jax.nn.softmax(ue @ pref.T, axis=1)  # [B, R]
        p_vec = att @ pref
        p_norm = att @ norm
        u_proj = _transh_project(ue, p_norm)
        pos_proj = _transh_project(item_emb[pos], p_norm)
        neg_proj = _transh_project(item_emb[neg], p_norm)
        pos_s = -jnp.sum(jnp.abs(u_proj + p_vec - pos_proj), axis=1)
        neg_s = -jnp.sum(jnp.abs(u_proj + p_vec - neg_proj), axis=1)
        cf_loss = jnp.mean(jax.nn.softplus(1.0 - pos_s + neg_s))

        # TransH KG loss on the batch triples
        w_r = norm[r]
        h_p = _transh_project(ent[h], w_r)
        pt_p = _transh_project(ent[pt], w_r)
        nt_p = _transh_project(ent[nt], w_r)
        d_r = rel[r]
        pos_k = -jnp.sum(jnp.abs(h_p + d_r - pt_p), axis=1)
        neg_k = -jnp.sum(jnp.abs(h_p + d_r - nt_p), axis=1)
        kg_loss = jnp.mean(jax.nn.softplus(1.0 - pos_k + neg_k))

        reg = l2_reg_loss(cfg.reg, ue, item_emb[pos], item_emb[neg]) / cfg.batch_size
        loss = cf_loss + cfg.alpha * kg_loss + reg
        return loss, {"rec_loss": cf_loss, "kg_loss": kg_loss}

    def encode_eval(params, extras):
        u, ent, rel, norm, pref = module.apply(params, kg)
        # eval scoring must be a dot product for the shared ranking path:
        # use the translated user u + mean preference (documented
        # simplification of the per-pair translation distance)
        att = jax.nn.softmax(u @ pref.T, axis=1)
        user_repr = u + att @ pref
        return user_repr, ent[kg.item_idx]

    return ModelBundle(
        name="KTUP", cfg=cfg, cf=cf, kg=kg, uses_kg=True,
        init=init, batch_loss=batch_loss, encode_eval=encode_eval,
    )


# ----------------------------------------------------------- RippleNet
N_HOPS = 2
N_MEM = 16


def build_ripple_sets(cf: CFDeviceData, kg: KGDeviceData, seed: int = 0) -> jnp.ndarray:
    """Padded per-user ripple sets [U, hops, mem, 3] (h, r, t).

    Hop 1 seeds from the user's interacted item entities; hop k+1 from
    hop-k tails; each hop uniformly subsampled to N_MEM triples (pads
    repeat the first sample; users with no triples get zero-entity
    self-loops with relation 0).
    """
    rng = np.random.default_rng(seed)
    h = np.asarray(kg.att_h)
    r = np.asarray(kg.att_r)
    t = np.asarray(kg.att_t)
    live = h < kg.n_entities
    h, r, t = h[live], r[live], t[live]
    order = np.argsort(h, kind="stable")
    h, r, t = h[order], r[order], t[order]
    starts = np.searchsorted(h, np.arange(kg.n_entities))
    ends = np.append(starts[1:], h.shape[0])

    item_ids = np.asarray(kg.item_idx)
    edge_u = np.asarray(cf.edge_u)
    edge_i = np.asarray(cf.edge_i)
    hist: list[list[int]] = [[] for _ in range(cf.n_users)]
    for u, i in zip(edge_u, edge_i):
        hist[u].append(item_ids[i])

    out = np.zeros((cf.n_users, N_HOPS, N_MEM, 3), np.int32)
    for u in range(cf.n_users):
        seeds = hist[u]
        for hop in range(N_HOPS):
            cand = []
            for s in seeds[:64]:
                lo, hi = starts[s], ends[s]
                if hi > lo:
                    take = min(hi - lo, 8)
                    sel = rng.choice(hi - lo, take, replace=False) + lo
                    cand.extend(sel.tolist())
            if not cand:
                out[u, hop, :, :] = 0
                seeds = []
                continue
            pick = rng.choice(len(cand), N_MEM, replace=len(cand) < N_MEM)
            idx = np.asarray(cand)[pick]
            out[u, hop, :, 0] = h[idx]
            out[u, hop, :, 1] = r[idx]
            out[u, hop, :, 2] = t[idx]
            seeds = t[idx].tolist()
    return jnp.asarray(out)


class RippleNetModule(nn.Module):
    n_entities: int
    n_relations: int
    dim: int

    @nn.compact
    def __call__(self, kg: KGDeviceData, ripple: jnp.ndarray):
        ent = self.param("entity_emb", nn.initializers.xavier_uniform(), (self.n_entities, self.dim))
        rel_m = self.param(
            "relation_mat", nn.initializers.xavier_uniform(), (self.n_relations, self.dim, self.dim)
        )
        item_emb = ent[kg.item_idx]  # [I, d]

        # user representation from ripple attention, per hop
        rh = ent[ripple[..., 0]]  # [U, H, M, d]
        rt = ent[ripple[..., 2]]
        # Rh = R_r @ h : einsum over the relation matrices
        rmat = rel_m[ripple[..., 1]]  # [U, H, M, d, d]
        rh_proj = jnp.einsum("uhmd,uhmde->uhme", rh, rmat)
        return item_emb, rh_proj, rt


@register_model("HKGRippleNet")
def build_ripplenet(cfg: Config, cf: CFDeviceData, kg: KGDeviceData) -> ModelBundle:
    assert kg is not None, "RippleNet requires knowledge data"
    module = RippleNetModule(kg.n_entities, kg.n_relations, cfg.embedding_size)
    ripple = build_ripple_sets(cf, kg, cfg.seed)

    def init(rng):
        return module.init(rng, kg, ripple[:2]), ()

    def _user_repr(item_emb, rh_proj, rt, v):
        """v: [B, d] candidate item embeddings; ripple tensors for the
        batch users. Returns o = Σ_h Σ_m softmax(v^T R h) t."""
        probs = jax.nn.softmax(jnp.einsum("bd,bhmd->bhm", v, rh_proj), axis=-1)
        o = jnp.einsum("bhm,bhmd->bd", probs, rt)
        return o

    def batch_loss(params, extras, batch, rng):
        users, pos, neg, *_ = batch
        item_emb, rh_proj, rt = module.apply(params, kg, ripple)
        rh_b, rt_b = rh_proj[users], rt[users]
        v_pos = item_emb[pos]
        v_neg = item_emb[neg]
        o_pos = _user_repr(item_emb, rh_b, rt_b, v_pos)
        o_neg = _user_repr(item_emb, rh_b, rt_b, v_neg)
        s_pos = jnp.sum(o_pos * v_pos, axis=1)
        s_neg = jnp.sum(o_neg * v_neg, axis=1)
        # BCE: clicked=1, negative=0
        loss = -jnp.mean(
            jnp.log(jax.nn.sigmoid(s_pos) + 1e-8) + jnp.log(1 - jax.nn.sigmoid(s_neg) + 1e-8)
        )
        reg = l2_reg_loss(cfg.reg, v_pos, v_neg) / cfg.batch_size
        return loss + reg, {"rec_loss": loss}

    def encode_eval(params, extras):
        item_emb, rh_proj, rt = module.apply(params, kg, ripple)
        # user repr against a mean item probe (full per-pair attention is
        # O(U*I*M); the probe keeps eval a dot product — documented
        # simplification)
        probe = jnp.mean(item_emb, axis=0, keepdims=True)
        probs = jax.nn.softmax(
            jnp.einsum("d,uhmd->uhm", probe[0], rh_proj), axis=-1
        )
        user_repr = jnp.einsum("uhm,uhmd->ud", probs, rt)
        return user_repr, item_emb

    return ModelBundle(
        name="HKGRippleNet", cfg=cfg, cf=cf, kg=kg, uses_kg=True,
        init=init, batch_loss=batch_loss, encode_eval=encode_eval,
    )
