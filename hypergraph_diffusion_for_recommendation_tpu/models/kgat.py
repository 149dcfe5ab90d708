"""KGAT — knowledge-graph attention network.

Parity with reference model/graph/KGAT.py:
  * embeddings: entity_user table [n_entities, d], relation table,
    TransR projections trans_M [R, d, dr] (:259-276);
  * CF embeddings: L aggregator layers over the attentive adjacency
    A_in, each output L2-row-normalised, all layers CONCATENATED
    (:286-297); aggregators: gcn / graphsage / bi-interaction with
    LayerNorm (:176-231);
  * A_in starts as zeros (:283-285 initialises an empty sparse tensor)
    and is refreshed ONCE PER EPOCH from the full triple list via
    tanh-scored TransR attention + row softmax (:349-389, driver
    :128-133);
  * training alternates: CF phase (BPR + alpha-free L2_loss_mean reg,
    own Adam), then KG phase (TransR loss * alpha, own Adam), grad clip
    4 on both (:66-125);
  * eval scores come from the concatenated embeddings at the user/item
    entity rows (:391-402, base/kggraph_recommender.py:71-77).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import Config
from ..data.device import CFDeviceData, KGDeviceData
from ..ops.losses import l2_loss_mean
from .base import ModelBundle, register_model
from .kg_common import att_matvec, attention_softmax, attention_values, project_by_relation


class Aggregator(nn.Module):
    out_dim: int
    dropout: float
    agg_type: str  # gcn | graphsage | bi-interaction

    @nn.compact
    def __call__(self, ego, side, train: bool = False):
        act = lambda y: jax.nn.leaky_relu(y, 0.01)  # torch LeakyReLU default slope
        if self.agg_type == "gcn":
            out = nn.LayerNorm()(act(nn.Dense(self.out_dim)(ego + side)))
        elif self.agg_type == "graphsage":
            out = nn.LayerNorm()(act(nn.Dense(self.out_dim)(jnp.concatenate([ego, side], axis=1))))
        else:  # bi-interaction (Equation 8)
            s = nn.LayerNorm()(act(nn.Dense(self.out_dim)(ego + side)))
            b = nn.LayerNorm()(act(nn.Dense(self.out_dim)(ego * side)))
            out = s + b
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class KGATModule(nn.Module):
    n_entities: int
    n_relations: int
    embed_dim: int
    relation_dim: int
    conv_dims: tuple
    mess_dropout: tuple
    agg_type: str

    def setup(self):
        self.entity_user_embed = self.param(
            "entity_user_embed", nn.initializers.xavier_uniform(), (self.n_entities, self.embed_dim)
        )
        self.relation_embed = self.param(
            "relation_embed", nn.initializers.xavier_uniform(), (self.n_relations, self.relation_dim)
        )
        self.trans_m = self.param(
            "trans_M", nn.initializers.xavier_uniform(),
            (self.n_relations, self.embed_dim, self.relation_dim),
        )
        self.aggregators = [
            Aggregator(d, p, self.agg_type) for d, p in zip(self.conv_dims, self.mess_dropout)
        ]

    def cf_embeddings(self, kg: KGDeviceData, att_vals: jnp.ndarray, train: bool = False):
        """Layer-concat embeddings over the attentive adjacency (:286-297)."""
        ego = self.entity_user_embed
        outs = [ego]
        for agg in self.aggregators:
            side = att_matvec(kg.att_h, kg.att_t, att_vals, ego, self.n_entities)
            ego = agg(ego, side, train)
            norm = ego / jnp.maximum(jnp.linalg.norm(ego, axis=1, keepdims=True), 1e-12)
            outs.append(norm)
        return jnp.concatenate(outs, axis=1)

    def __call__(self, kg: KGDeviceData, att_vals: jnp.ndarray, train: bool = False):
        return self.cf_embeddings(kg, att_vals, train)


@register_model("KGAT")
def build_kgat(cfg: Config, cf: CFDeviceData, kg: KGDeviceData) -> ModelBundle:
    assert kg is not None, "KGAT requires knowledge data (use_knowledge=true)"
    module = KGATModule(
        kg.n_entities, kg.n_relations, cfg.embedding_size, cfg.relation_dim,
        tuple(cfg.conv_dim_list), tuple(cfg.mess_dropout), cfg.aggregation_type,
    )

    def init(rng):
        k1, k2 = jax.random.split(rng)
        params = module.init({"params": k1, "dropout": k2}, kg, jnp.zeros_like(kg.att_h, jnp.float32))
        # A_in starts empty/zero (KGAT.py:283-285)
        extras = {"att_vals": jnp.zeros(kg.att_h.shape[0], jnp.float32)}
        return params, extras

    def _tables(params):
        p = params["params"]
        return p["entity_user_embed"], p["relation_embed"], p["trans_M"]

    def batch_loss(params, extras, batch, rng):
        users, pos, neg = batch  # dense CF ids
        all_emb = module.apply(params, kg, extras["att_vals"], True, rngs={"dropout": rng})
        # ONE merged user/pos/neg row gather (one backward scatter)
        upn = all_emb[
            jnp.concatenate([kg.user_idx[users], kg.item_idx[pos], kg.item_idx[neg]])
        ]
        u_emb, p_emb, n_emb = jnp.split(upn, 3, axis=0)
        pos_score = jnp.sum(u_emb * p_emb, axis=1)
        neg_score = jnp.sum(u_emb * n_emb, axis=1)
        cf_loss = jnp.mean(-jax.nn.log_sigmoid(pos_score - neg_score))
        l2 = l2_loss_mean(u_emb) + l2_loss_mean(p_emb) + l2_loss_mean(n_emb)
        loss = cf_loss + cfg.reg * l2
        return loss, {"rec_loss": cf_loss}

    def kg_batch_loss(params, extras, batch, rng):
        h, r, pos_t, neg_t = batch
        ent, rel, w = _tables(params)
        from .kg_common import relation_lookup

        r_emb = relation_lookup(rel, r)
        # one merged h/pos/neg gather + one batched projection (same r)
        proj3 = project_by_relation(
            ent[jnp.concatenate([h, pos_t, neg_t])], w, jnp.concatenate([r, r, r])
        )
        r_mul_h, r_mul_pos, r_mul_neg = jnp.split(proj3, 3, axis=0)
        pos_score = jnp.sum(jnp.square(r_mul_h + r_emb - r_mul_pos), axis=1)
        neg_score = jnp.sum(jnp.square(r_mul_h + r_emb - r_mul_neg), axis=1)
        kg_loss = jnp.mean(-jax.nn.log_sigmoid(neg_score - pos_score))
        l2 = (
            l2_loss_mean(r_mul_h) + l2_loss_mean(r_emb)
            + l2_loss_mean(r_mul_pos) + l2_loss_mean(r_mul_neg)
        )
        loss = cfg.alpha * (kg_loss + cfg.reg_kg * l2)
        return loss, {"kg_loss": kg_loss}

    def epoch_update_extras(params, extras, rng):
        ent, rel, w = _tables(params)
        vals = attention_values(ent, rel, w, kg.att_h, kg.att_t, kg.att_r)
        att = attention_softmax(vals, kg.att_h, kg.n_entities, kg.att_valid)
        return {"att_vals": att}

    def encode_eval(params, extras):
        all_emb = module.apply(params, kg, extras["att_vals"], False)
        return all_emb[kg.user_idx], all_emb[kg.item_idx]

    return ModelBundle(
        name="KGAT", cfg=cfg, cf=cf, kg=kg, uses_kg=True,
        init=init, batch_loss=batch_loss, encode_eval=encode_eval,
        kg_batch_loss=kg_batch_loss,
        epoch_update_extras=jax.jit(epoch_update_extras),
        alternating=True, grad_clip_norm=4.0,
    )
