"""KGIN and KGCL — KG-aware recommenders that exist only as notebooks
in the reference (root KGIN.ipynb / KGCL.ipynb define the classes
in-notebook; no model files — survey section 1 note). Compact TPU-native
implementations of the papers' core mechanisms:

  KGIN  intent-aware relational propagation: K latent intents as
        softmax mixtures over relation embeddings; items aggregate
        relational KG messages (r ⊙ e_t, segment-mean per head), users
        aggregate interacted items through intent gates; BPR +
        intent-independence (pairwise cosine) loss.
  KGCL  KG-enhanced contrastive learning: items enriched with a
        relational neighbour summary, LightGCN over the joined graph,
        two edge-dropout views, InfoNCE on batch users/items.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import Config
from ..data.device import CFDeviceData, KGDeviceData
from ..ops.losses import bpr_loss, info_nce_masked, l2_reg_loss, unique_mask
from ..ops.sparse import scatter_mean, spmm_pair
from .base import ModelBundle, register_model

N_INTENTS = 4


class KGINModule(nn.Module):
    n_users: int
    n_items: int
    n_entities: int
    n_relations: int
    dim: int
    n_hops: int

    @nn.compact
    def __call__(self, cf: CFDeviceData, kg: KGDeviceData):
        u_emb = self.param("user_emb", nn.initializers.xavier_uniform(), (self.n_users, self.dim))
        ent = self.param("entity_emb", nn.initializers.xavier_uniform(), (self.n_entities, self.dim))
        rel = self.param("relation_emb", nn.initializers.xavier_uniform(), (self.n_relations, self.dim))
        intent_logits = self.param(
            "intent_att", nn.initializers.xavier_uniform(), (N_INTENTS, self.n_relations)
        )
        # intents = softmax mixtures over relation embeddings (KGIN eq. 2)
        intents = jax.nn.softmax(intent_logits, axis=1) @ rel  # [K, d]

        # relational KG propagation for entities: e_h += mean_t (r ⊙ e_t)
        h = jnp.clip(kg.att_h, 0, self.n_entities - 1)
        t = jnp.clip(kg.att_t, 0, self.n_entities - 1)
        live = (kg.att_h < self.n_entities).astype(ent.dtype)[:, None]
        e = ent
        layers = [ent]
        for _ in range(self.n_hops):
            msg = rel[kg.att_r] * e[t] * live
            agg = scatter_mean(msg, h, self.n_entities, sorted_ids=True)
            e = agg
            layers.append(e)
        ent_final = sum(layers) / len(layers)
        item_emb = ent_final[kg.item_idx]

        # users: intent-gated aggregation of interacted items (eq. 4-6)
        # att(u, p) ∝ exp(u ⋅ intent_p)
        gate = jax.nn.softmax(u_emb @ intents.T, axis=1)  # [U, K]
        u_intent = gate @ intents  # [U, d]
        agg_items = spmm_pair(cf.int_norm.fwd, cf.int_norm.bwd, item_emb)
        user_final = u_emb + u_intent * agg_items
        return user_final, item_emb, intents


@register_model("KGIN")
def build_kgin(cfg: Config, cf: CFDeviceData, kg: KGDeviceData) -> ModelBundle:
    assert kg is not None, "KGIN requires knowledge data"
    module = KGINModule(
        cf.n_users, cf.n_items, kg.n_entities, kg.n_relations, cfg.embedding_size, cfg.n_layers
    )

    def init(rng):
        return module.init(rng, cf, kg), ()

    def batch_loss(params, extras, batch, rng):
        users, pos, neg, *_ = batch
        u_emb, i_emb, intents = module.apply(params, cf, kg)
        ue, pe, ne = u_emb[users], i_emb[pos], i_emb[neg]
        rec = bpr_loss(ue, pe, ne)
        reg = l2_reg_loss(cfg.reg, ue, pe, ne) / cfg.batch_size
        # intent independence: mean pairwise |cosine| (KGIN eq. 10 variant)
        z = intents / jnp.maximum(jnp.linalg.norm(intents, axis=1, keepdims=True), 1e-12)
        cos = z @ z.T
        k = cos.shape[0]
        ind = (jnp.sum(jnp.abs(cos)) - k) / jnp.maximum(k * (k - 1), 1)
        ind = cfg.cl_rate * ind
        return rec + reg + ind, {"rec_loss": rec, "ind_loss": ind}

    def encode_eval(params, extras):
        u_emb, i_emb, _ = module.apply(params, cf, kg)
        return u_emb, i_emb

    return ModelBundle(
        name="KGIN", cfg=cfg, cf=cf, kg=kg, uses_kg=True,
        init=init, batch_loss=batch_loss, encode_eval=encode_eval,
    )


class KGCLModule(nn.Module):
    n_users: int
    n_items: int
    n_entities: int
    n_relations: int
    dim: int
    n_layers: int

    @nn.compact
    def __call__(self, cf: CFDeviceData, kg: KGDeviceData, keep_rate: float = 1.0, train: bool = False):
        u = self.param("user_emb", nn.initializers.xavier_uniform(), (self.n_users, self.dim))
        i = self.param("item_emb", nn.initializers.xavier_uniform(), (self.n_items, self.dim))
        ent = self.param("entity_emb", nn.initializers.xavier_uniform(), (self.n_entities, self.dim))
        rel = self.param("relation_emb", nn.initializers.xavier_uniform(), (self.n_relations, self.dim))

        # KG neighbour summary per entity -> item enrichment
        h = jnp.clip(kg.att_h, 0, self.n_entities - 1)
        t = jnp.clip(kg.att_t, 0, self.n_entities - 1)
        live = (kg.att_h < self.n_entities).astype(ent.dtype)[:, None]
        msg = rel[kg.att_r] * ent[t] * live
        kg_summary = scatter_mean(msg, h, self.n_entities, sorted_ids=True)
        item_kg = kg_summary[kg.item_idx]
        item_in = i + item_kg

        adj = cf.adj
        if train and keep_rate < 1.0:
            adj = adj.dropped(self.make_rng("edges"), keep_rate)
        ego = jnp.concatenate([u, item_in], axis=0)
        outs = [ego]
        for _ in range(self.n_layers):
            outs.append(spmm_pair(adj.fwd, adj.bwd, outs[-1]))
        emb = jnp.mean(jnp.stack(outs, 1), 1)
        return emb[: self.n_users], emb[self.n_users :]


@register_model("KGCL")
def build_kgcl(cfg: Config, cf: CFDeviceData, kg: KGDeviceData) -> ModelBundle:
    assert kg is not None, "KGCL requires knowledge data"
    module = KGCLModule(
        cf.n_users, cf.n_items, kg.n_entities, kg.n_relations, cfg.embedding_size, cfg.n_layers
    )

    def init(rng):
        return module.init({"params": rng, "edges": rng}, cf, kg), ()

    def batch_loss(params, extras, batch, rng):
        users, pos, neg, *_ = batch
        k0, k1, k2 = jax.random.split(rng, 3)
        u_emb, i_emb = module.apply(params, cf, kg, rngs={"edges": k0})
        ue, pe, ne = u_emb[users], i_emb[pos], i_emb[neg]
        rec = bpr_loss(ue, pe, ne)
        reg = l2_reg_loss(cfg.reg, ue, pe, ne) / cfg.batch_size
        u1, i1 = module.apply(params, cf, kg, 1.0 - cfg.drop_rate, True, rngs={"edges": k1})
        u2, i2 = module.apply(params, cf, kg, 1.0 - cfg.drop_rate, True, rngs={"edges": k2})
        uu, um = unique_mask(users)
        iu, im = unique_mask(pos)
        cl = info_nce_masked(u1[uu], u2[uu], um, cfg.temp)
        cl = cl + info_nce_masked(i1[iu], i2[iu], im, cfg.temp)
        cl = cfg.cl_rate * cl
        return rec + reg + cl, {"rec_loss": rec, "cl_loss": cl}

    def encode_eval(params, extras):
        return module.apply(params, cf, kg)

    return ModelBundle(
        name="KGCL", cfg=cfg, cf=cf, kg=kg, uses_kg=True,
        init=init, batch_loss=batch_loss, encode_eval=encode_eval,
    )
