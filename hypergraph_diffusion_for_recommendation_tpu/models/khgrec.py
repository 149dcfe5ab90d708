"""KHGRec — the flagship KG-aware hypergraph recommender.

Parity with reference model/graph/KHGRec.py:
  * one shared user-entity embedding table [n_entities, hyper_dim]
    (:277-282); CF ego = table[user raw ids] ++ table[item raw ids]
    (:284-287);
  * SelfAwareEncoder (CF): per layer LN(HGCNConv(A_drop)) + residual,
    activation off on the last conv (:374-417; self-attention branch
    exists but is disabled by default, :387);
  * RelationalAwareEncoder (KG): per layer
    LN(AttHGCNConv(kg_adj_drop, A_att)) + residual (:419-453), where
    AttHGCNConv(X) = M (M^T X) with M = A_att @ K (:440-453) — here
    computed as the 4-SpMM chain A_att K K^T A_att^T X, never forming
    the sparse-sparse product;
  * per-batch attention refresh from the BATCH triples only: A_att is
    rebuilt each step from the kg batch's (h, pos_t, r) with TransR
    tanh scoring + row softmax (:309-331; the reference round-trips
    through CPU sparse softmax, :330);
  * attention fusion of CF/KG item views (:466-480; the reference's
    separate Attention modules are excluded from its optimizer —
    KHGRec.py:41 only passes model.parameters() — we train them,
    documented deviation);
  * losses: BPR + l2/batch (:341-345), TransR KG loss + l2/batch_kg
    (:347-365), cross-view contrastLoss SSL (:367-372; the item term's
    self-compare copy bug is fixed to the intended cross-view,
    survey 7.4);
  * modes full / wo_attention / wo_ssl / woglobal (:64-75).

Attention ordering matches the reference exactly: each step's kg
forward (under the previous batch's attention) serves the TransR/SSL
losses AND scores the attention applied to the NEXT batch
(:120-126) — one forward, no recomputation.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import Config
from ..data.device import CFDeviceData, KGDeviceData
from ..ops.losses import bpr_loss, contrast_loss_pregathered, l2_reg_loss, unique_mask
from .base import ModelBundle, register_model
from .kg_common import att_matvec, att_matvec_t, attention_softmax, attention_values
from .layers import AttentionFusion, hgcn_conv
from ..ops import sparse as _sp
from ..ops.sparse import spmm


class SelfAwareEncoder(nn.Module):
    n_users: int
    dim: int
    n_layers: int
    slope: float
    use_self_att: bool = False  # HGNN/HD2 enable it (HGNN_cp.py:369, HD2.py:395-421)
    use_hyper: bool = True  # HGNNAblation toggles two-hop vs one-hop (HGNNAblation.py:490-510)

    def setup(self):
        # setup-defined so the joint (block-diagonal) fast path can
        # reuse the SAME LayerNorm params as this unfused path
        self.lns = [nn.LayerNorm() for _ in range(self.n_layers)]
        if self.use_self_att:
            from .layers import SelfAttentionBlock

            self.att_blocks = [SelfAttentionBlock(self.dim) for _ in range(self.n_layers)]

    def __call__(self, ego, adj, train: bool = False):
        from ..ops.sparse import spmm_pair as _spmm_pair

        res = ego
        for k in range(self.n_layers):
            if self.use_self_att:
                ego = self.att_blocks[k](ego, train)
            act = k != self.n_layers - 1
            if self.use_hyper:
                conv = hgcn_conv(adj, ego, self.slope, act=act)
            else:
                conv = _spmm_pair(adj.fwd, adj.bwd, ego)
                if act:
                    conv = jax.nn.leaky_relu(conv, self.slope)
            ego = self.lns[k](conv) + res
        return ego[: self.n_users], ego[self.n_users :]


class RelationalAwareEncoder(nn.Module):
    dim: int
    n_layers: int
    slope: float
    # KHGRec folds the learned attention adjacency into the KG conv
    # (M = A_att K, KHGRec.py:419-438); HGNN's AttHGCNConv comments that
    # multiply OUT (`adj = inp_adj`, HGNN_cp.py:440-446) — its KG conv is
    # the plain two-hop K (K^T x). Parity demands both forms.
    use_att_adj: bool = True

    def setup(self):
        self.lns = [nn.LayerNorm() for _ in range(self.n_layers)]

    def __call__(self, embs, kg_adj, att, train: bool = False):
        att_h, att_t, att_v = att
        n = embs.shape[0]

        def att_conv(x, act: bool):
            if not self.use_att_adj:
                y = _sp.spmm_pair(kg_adj.bwd, kg_adj.fwd, x)
                y = _sp.spmm_pair(kg_adj.fwd, kg_adj.bwd, y)
                return jax.nn.leaky_relu(y, self.slope) if act else y
            # M (M^T x) with M = A_att K: A_att K K^T A_att^T x
            y = att_matvec_t(att_h, att_t, att_v, x, n)
            y = _sp.spmm_pair(kg_adj.bwd, kg_adj.fwd, y)
            y = _sp.spmm_pair(kg_adj.fwd, kg_adj.bwd, y)
            y = att_matvec(att_h, att_t, att_v, y, n)
            return jax.nn.leaky_relu(y, self.slope) if act else y

        res = embs
        for k in range(self.n_layers):
            embs = self.lns[k](att_conv(embs, act=(k != self.n_layers - 1))) + res
        return embs


class KHGRecModule(nn.Module):
    n_entities: int
    n_relations: int
    n_users: int
    hyper_dim: int
    relation_dim: int
    n_layers: int
    slope: float

    use_self_att: bool = False
    use_hyper: bool = True
    kg_use_att_adj: bool = True  # HGNN drops the A_att multiply (HGNN_cp.py:440-446)
    # active (data, model) mesh: routes entity-TABLE lookups through the
    # explicit shard_map collective (parallel/embedding.py) instead of
    # letting GSPMD choose a strategy. None = plain gather.
    lookup_mesh: object = None

    def table_lookup(self, idx):
        """user_entity_emb[idx] — explicit psum-of-partials collective
        when a mesh is wired (row-sharded table), plain gather otherwise."""
        if self.lookup_mesh is not None:
            from ..parallel.embedding import spmd_sharded_lookup

            return spmd_sharded_lookup(self.user_entity_emb, idx, self.lookup_mesh)
        return self.user_entity_emb[idx]

    def setup(self):
        self.user_entity_emb = self.param(
            "user_entity_emb", nn.initializers.xavier_uniform(), (self.n_entities, self.hyper_dim)
        )
        self.relation_emb = self.param(
            "relation_emb", nn.initializers.xavier_uniform(), (self.n_relations, self.relation_dim)
        )
        self.trans_m = self.param(
            "trans_M", nn.initializers.xavier_uniform(),
            (self.n_relations, self.hyper_dim, self.relation_dim),
        )
        self.cf_encoder = SelfAwareEncoder(
            self.n_users, self.hyper_dim, self.n_layers, self.slope,
            self.use_self_att, self.use_hyper,
        )
        self.kg_encoder = RelationalAwareEncoder(
            self.hyper_dim, self.n_layers, self.slope, self.kg_use_att_adj
        )
        self.attention_item = AttentionFusion(self.hyper_dim)

    def cf_forward(self, cf: CFDeviceData, kg: KGDeviceData, keep_rate: float, train: bool):
        # ONE gather over the concatenated index vector: merging lookups
        # from the same table also merges their backward scatter-adds
        # into one op (unsorted scatters are the slow direction on TPU)
        ego = self.table_lookup(jnp.concatenate([kg.user_idx, kg.item_idx]))
        adj = cf.adj
        if train and keep_rate < 1.0:
            adj = adj.dropped(self.make_rng("edges"), keep_rate)
        return self.cf_encoder(ego, adj, train)

    def kg_forward(self, kg: KGDeviceData, att, keep_rate: float, train: bool):
        kg_adj = kg.kg_adj
        if train and keep_rate < 1.0:
            kg_adj = kg_adj.dropped(self.make_rng("edges"), keep_rate)
        return self.kg_encoder(self.user_entity_emb, kg_adj, att, train)

    def fuse_items(self, item_cf, item_kg, use_attention: bool):
        stacked = jnp.stack([item_cf, item_kg], axis=1)
        if use_attention:
            fused, _ = self.attention_item(stacked)
            return fused
        return jnp.mean(stacked, axis=1)

    def joint_encode(self, cf: CFDeviceData, kg: KGDeviceData, att, joint_adj,
                     keep_rate: float, train: bool):
        """Fused CF+KG forward over the block-diagonal adjacency.

        The two encoders' per-layer chains are independent, so their
        spmms run as ONE spmm over the stacked [cf nodes; entities]
        space (half the op count, one bigger matrix). Numerics are identical to
        the unfused pair (same LayerNorm params via the encoders' setup
        -defined `lns`) apart from the edge-dropout rng stream: one
        draw covers the joint matrix instead of one per matrix.
        """
        att_h, att_t, att_v = att
        n_nodes = cf.n_nodes
        n_ent = kg.n_entities
        ego_cf = self.table_lookup(jnp.concatenate([kg.user_idx, kg.item_idx]))
        x = jnp.concatenate([ego_cf, self.user_entity_emb], axis=0)
        adj = joint_adj
        if train and keep_rate < 1.0:
            adj = adj.dropped(self.make_rng("edges"), keep_rate)
        res = x
        for k in range(self.n_layers):
            act = k != self.n_layers - 1
            z = att_matvec_t(att_h, att_t, att_v, x[n_nodes:], n_ent)
            s = jnp.concatenate([x[:n_nodes], z], axis=0)
            y = _sp.spmm_pair(adj.bwd, adj.fwd, s)
            y = _sp.spmm_pair(adj.fwd, adj.bwd, y)
            w = att_matvec(att_h, att_t, att_v, y[n_nodes:], n_ent)
            conv_cf = jax.nn.leaky_relu(y[:n_nodes], self.slope) if act else y[:n_nodes]
            conv_kg = jax.nn.leaky_relu(w, self.slope) if act else w
            x = jnp.concatenate(
                [
                    self.cf_encoder.lns[k](conv_cf) + res[:n_nodes],
                    self.kg_encoder.lns[k](conv_kg) + res[n_nodes:],
                ],
                axis=0,
            )
        return x[: self.n_users], x[self.n_users : n_nodes], x[n_nodes:]

    def __call__(self, cf: CFDeviceData, kg: KGDeviceData, att, keep_rate: float = 1.0,
                 train: bool = False, use_attention: bool = True, joint_adj=None):
        if joint_adj is not None:
            u_cf, i_cf, ent_kg = self.joint_encode(cf, kg, att, joint_adj, keep_rate, train)
        else:
            u_cf, i_cf = self.cf_forward(cf, kg, keep_rate, train)
            ent_kg = self.kg_forward(kg, att, keep_rate, train)
        # merged user+item lookup (one gather; see cf_forward note)
        uikg = ent_kg[jnp.concatenate([kg.user_idx, kg.item_idx])]
        u_kg = uikg[: self.n_users]
        i_kg = uikg[self.n_users :]
        fused = self.fuse_items(i_cf, i_kg, use_attention)
        return u_cf, i_cf, ent_kg, u_kg, i_kg, fused


def _build_khgrec_like(
    name: str,
    use_self_att: bool = False,
    force_no_ssl: bool = False,
    hyper_from_mode: bool = False,
    kg_att_adj: bool = True,
):
    """Factory covering the KHGRec skeleton family:
      KHGRec       (KHGRec.py)       — no self-att, SSL per mode
      HGNN         (HGNN_cp.py:26)   — self-att CF encoder + SSL
      HD2          (HD2.py:395-421)  — self-att CF encoder, no SSL
      HGNNAblation (HGNNAblation.py:490-510) — mode 'wohyper' swaps the
                    two-hop HGCNConv for a one-hop GCN
    """

    def builder(cfg: Config, cf: CFDeviceData, kg: KGDeviceData) -> ModelBundle:
        assert kg is not None, f"{name} requires knowledge data (use_knowledge=true)"
        use_ssl = (not force_no_ssl) and cfg.mode in ("full", "woatt", "wo_attention")
        use_att = cfg.mode in ("full", "wossl", "wo_ssl")
        use_hyper = (cfg.mode != "wohyper") if hyper_from_mode else True
        # explicit-collective table lookups when building for a mesh
        # whose model axis actually shards the entity table (mirrors
        # parallel.mesh.param_shardings' row-sharding conditions)
        from .base import build_mesh
        from ..parallel.mesh import MODEL_AXIS

        mesh = build_mesh()
        lookup_mesh = None
        if (
            mesh is not None
            and mesh.shape.get(MODEL_AXIS, 1) > 1
            and kg.n_entities % mesh.shape[MODEL_AXIS] == 0
            and kg.n_entities >= cfg.shard_min_rows
        ):
            lookup_mesh = mesh
        module = KHGRecModule(
            kg.n_entities, kg.n_relations, cf.n_users,
            cfg.hyper_dim, cfg.relation_dim, cfg.n_layers, cfg.p,
            use_self_att=use_self_att, use_hyper=use_hyper,
            kg_use_att_adj=kg_att_adj, lookup_mesh=lookup_mesh,
        )
        # joint (block-diagonal) path: OPT-IN via HGDR_JOINT=1. Measured
        # on TPU v5e the merged spmm is ~7% slower than the two separate
        # chains (gathers are row-rate bound, so one big gather costs
        # the sum of the small ones and the merged layout pads more), so
        # the unfused pair stays the default; the fused path is kept
        # (equivalence-tested) for topologies that pack better.
        joint = None
        if (
            use_hyper
            and not use_self_att
            and os.environ.get("HGDR_JOINT")
            and cf.adj.host is not None
            and kg.kg_adj.host is not None
        ):
            from ..data.device import blockdiag_pair

            joint = blockdiag_pair(cf.adj, kg.kg_adj)
        return _finish_bundle(name, cfg, cf, kg, module, use_ssl, use_att, joint,
                              use_self_att=use_self_att)

    return builder


def _finish_bundle(name, cfg, cf, kg, module, use_ssl, use_att, joint_adj=None,
                   use_self_att=False) -> ModelBundle:
    keep = 1.0 - cfg.drop_rate
    # cached-propagation training (core/config.py prop_cache_steps): K>1
    # runs the true full-graph loss every K-th step (refreshing cached
    # propagated tables from that same forward) and trains the K-1 steps
    # between on the cached tables with straight-through gradients — the
    # full-graph spmm chains (the ~85% of step time that scales with
    # nnz) are skipped on those steps. Quality A/B: results/prop_cache_ab/.
    K_cache = max(int(getattr(cfg, "prop_cache_steps", 0) or 0), 0)
    use_prop_cache = K_cache > 1

    def init(rng):
        b = cfg.batch_size_kg
        att0 = (
            jnp.arange(b, dtype=jnp.int32) % kg.n_entities,
            jnp.arange(b, dtype=jnp.int32) % kg.n_entities,
            jnp.ones((b,), jnp.float32),
        )
        params = module.init(
            {"params": rng, "edges": rng}, cf, kg, att0, 1.0, False, use_att,
            joint_adj=joint_adj,
        )
        extras = {"att_h": att0[0], "att_t": att0[1], "att_v": att0[2]}
        if use_prop_cache:
            d = cfg.hyper_dim
            extras.update(
                # age 0 -> the first step takes the full branch and
                # populates the tables before any cached step runs
                prop_age=jnp.zeros((), jnp.int32),
                prop_u=jnp.zeros((cf.n_users, d), jnp.float32),
                prop_icf=jnp.zeros((cf.n_items, d), jnp.float32),
                prop_fused=jnp.zeros((cf.n_items, d), jnp.float32),
                prop_ent=jnp.zeros((kg.n_entities, d), jnp.float32),
            )
        return params, extras

    def _att(extras):
        return (extras["att_h"], extras["att_t"], extras["att_v"])

    def full_loss(params, extras, batch, rng):
        users, pos, neg, h, r, pt, nt = batch
        k1, k2 = jax.random.split(rng)
        u_cf, i_cf, ent_kg, u_kg, i_kg, fused = module.apply(
            params, cf, kg, _att(extras), keep, True, use_att,
            joint_adj=joint_adj, rngs={"edges": k1, "dropout": k2},
        )
        # CF loss (:341-345) — user and pos/neg item rows fetched by ONE
        # gather over a stacked [u_cf; fused] table (fixed-cost gathers;
        # the merged op also collapses the three backward scatters into one)
        n_users = cf.n_users
        upn_table = jnp.concatenate([u_cf, fused], axis=0)
        upn = upn_table[jnp.concatenate([users, n_users + pos, n_users + neg])]
        ue, pe, ne = jnp.split(upn, 3, axis=0)
        rec = bpr_loss(ue, pe, ne)
        cf_loss = rec + l2_reg_loss(cfg.reg, ue, pe, ne) / cfg.batch_size
        # KG TransR loss on the kg-encoded embeddings (:124-126, :347-365)
        p = params["params"]
        from .kg_common import project_by_relation, relation_lookup

        r_emb = relation_lookup(p["relation_emb"], r)
        # one batched relation projection for h/pos/neg (same r vector)
        proj3 = project_by_relation(
            ent_kg[jnp.concatenate([h, pt, nt])],
            p["trans_M"],
            jnp.concatenate([r, r, r]),
        )
        r_mul_h, r_mul_pos, r_mul_neg = jnp.split(proj3, 3, axis=0)
        pos_score = jnp.sum(jnp.square(r_mul_h + r_emb - r_mul_pos), axis=1)
        neg_score = jnp.sum(jnp.square(r_mul_h + r_emb - r_mul_neg), axis=1)
        kg_loss = jnp.mean(-jax.nn.log_sigmoid(neg_score - pos_score))
        kg_loss = kg_loss + l2_reg_loss(cfg.reg_kg, r_mul_h, r_emb, r_mul_pos, r_mul_neg) / cfg.batch_size_kg

        loss = cf_loss + kg_loss
        # attention for the NEXT batch, scored from THIS forward's kg
        # embeddings (reference ordering, KHGRec.py:120-126): one kg
        # forward serves the losses and the attention refresh
        ent_sg = jax.lax.stop_gradient(ent_kg)
        p_sg = jax.lax.stop_gradient(p)
        vals = attention_values(ent_sg, p_sg["relation_emb"], p_sg["trans_M"], h, pt, r)
        att_v = attention_softmax(vals, h, kg.n_entities)
        new_extras = {"att_h": h, "att_t": pt, "att_v": att_v}
        if use_prop_cache:
            # refresh the cached propagated tables from THIS forward (the
            # same one the losses used — no extra propagation); values
            # carry the step's edge-dropout draw, like every reference
            # step's forward does
            new_extras.update(
                prop_age=extras["prop_age"] + 1,
                prop_u=jax.lax.stop_gradient(u_cf),
                prop_icf=jax.lax.stop_gradient(i_cf),
                prop_fused=jax.lax.stop_gradient(fused),
                prop_ent=ent_sg,
            )
        aux = {
            "rec_loss": rec,
            "cf_loss": cf_loss,
            "kg_loss": kg_loss,
            "_new_extras": new_extras,
        }
        if use_ssl:
            # one gather per VIEW (users and items stacked) instead of
            # four; row-normalisation commutes with the gather so the
            # numerics match contrast_loss_masked on the full arrays
            uu, um = unique_mask(users)
            iu, im = unique_mask(pos)
            b = users.shape[0]
            ids = jnp.concatenate([uu, cf.n_users + iu])
            cf_view = jnp.concatenate([u_cf, i_cf], axis=0)[ids]
            kg_view = jnp.concatenate([u_kg, i_kg], axis=0)[ids]
            ssl = contrast_loss_pregathered(cf_view[:b], kg_view[:b], um, cfg.temp)
            ssl = ssl + contrast_loss_pregathered(cf_view[b:], kg_view[b:], im, cfg.temp)
            ssl = cfg.cl_rate * ssl
            aux["cl_loss"] = ssl
            loss = loss + ssl
        return loss, aux

    def cached_loss(params, extras, batch, rng):
        """The between-refresh step of cached-propagation training: the
        same loss formulas as full_loss, but every propagated row comes
        from the cached tables with a straight-through identity path
        into the embedding table — `st(prop, ego) = prop + ego - sg(ego)`
        has the cached propagation's VALUE and the own-row (residual /
        self) component of its gradient, which the encoders' per-layer
        `LN(conv) + res` residual makes a true Jacobian term. Parameters
        inside the propagation (LayerNorms, attention fusion) receive
        gradients only on the full steps."""
        users, pos, neg, h, r, pt, nt = batch
        p = params["params"]
        table = p["user_entity_emb"]

        def st(prop_rows, ego_rows):
            return prop_rows + ego_rows - jax.lax.stop_gradient(ego_rows)

        from .kg_common import project_by_relation, relation_lookup

        # CF loss on cached user/fused-item rows (identity path = the
        # row's own entry in the shared entity table)
        upn_ids = jnp.concatenate(
            [kg.user_idx[users], kg.item_idx[pos], kg.item_idx[neg]]
        )
        ego3 = table[upn_ids]
        ego_u, ego_p, ego_n = jnp.split(ego3, 3, axis=0)
        ue = st(extras["prop_u"][users], ego_u)
        pe = st(extras["prop_fused"][pos], ego_p)
        ne = st(extras["prop_fused"][neg], ego_n)
        rec = bpr_loss(ue, pe, ne)
        cf_loss = rec + l2_reg_loss(cfg.reg, ue, pe, ne) / cfg.batch_size
        # KG TransR loss on cached entity rows; relation_emb/trans_M are
        # outside the propagation and train exactly as in full_loss
        r_emb = relation_lookup(p["relation_emb"], r)
        hpn = jnp.concatenate([h, pt, nt])
        ent_rows = st(extras["prop_ent"][hpn], table[hpn])
        proj3 = project_by_relation(ent_rows, p["trans_M"], jnp.concatenate([r, r, r]))
        r_mul_h, r_mul_pos, r_mul_neg = jnp.split(proj3, 3, axis=0)
        pos_score = jnp.sum(jnp.square(r_mul_h + r_emb - r_mul_pos), axis=1)
        neg_score = jnp.sum(jnp.square(r_mul_h + r_emb - r_mul_neg), axis=1)
        kg_loss = jnp.mean(-jax.nn.log_sigmoid(neg_score - pos_score))
        kg_loss = kg_loss + l2_reg_loss(cfg.reg_kg, r_mul_h, r_emb, r_mul_pos, r_mul_neg) / cfg.batch_size_kg
        loss = cf_loss + kg_loss
        # next-batch attention scored from the cached (clean of grad)
        # entity table — same stop-gradient semantics as full_loss
        p_sg = jax.lax.stop_gradient(p)
        vals = attention_values(
            extras["prop_ent"], p_sg["relation_emb"], p_sg["trans_M"], h, pt, r
        )
        att_v = attention_softmax(vals, h, kg.n_entities)
        aux = {
            "rec_loss": rec,
            "cf_loss": cf_loss,
            "kg_loss": kg_loss,
            "_new_extras": {
                "att_h": h, "att_t": pt, "att_v": att_v,
                "prop_age": extras["prop_age"] + 1,
                "prop_u": extras["prop_u"],
                "prop_icf": extras["prop_icf"],
                "prop_fused": extras["prop_fused"],
                "prop_ent": extras["prop_ent"],
            },
        }
        if use_ssl:
            uu, um = unique_mask(users)
            iu, im = unique_mask(pos)
            u_cf_v = st(extras["prop_u"][uu], table[kg.user_idx[uu]])
            i_cf_v = st(extras["prop_icf"][iu], table[kg.item_idx[iu]])
            u_kg_v = st(extras["prop_ent"][kg.user_idx[uu]], table[kg.user_idx[uu]])
            i_kg_v = st(extras["prop_ent"][kg.item_idx[iu]], table[kg.item_idx[iu]])
            ssl = contrast_loss_pregathered(u_cf_v, u_kg_v, um, cfg.temp)
            ssl = ssl + contrast_loss_pregathered(i_cf_v, i_kg_v, im, cfg.temp)
            ssl = cfg.cl_rate * ssl
            aux["cl_loss"] = ssl
            loss = loss + ssl
        return loss, aux

    if use_prop_cache:

        def batch_loss(params, extras, batch, rng):
            is_full = (extras["prop_age"] % K_cache) == 0
            return jax.lax.cond(
                is_full, full_loss, cached_loss, params, extras, batch, rng
            )

    else:
        batch_loss = full_loss

    def encode_eval(params, extras):
        u_cf, i_cf, ent_kg, u_kg, i_kg, fused = module.apply(
            params, cf, kg, _att(extras), 1.0, False, use_att, joint_adj=joint_adj
        )
        return u_cf, fused

    return ModelBundle(
        name=name, cfg=cfg, cf=cf, kg=kg, uses_kg=True,
        init=init, batch_loss=batch_loss, encode_eval=encode_eval,
        # self-att recall trajectories plateau early on some seeds before
        # climbing; double patience rides out the plateau (round-3
        # root-cause of the HGNN seed outlier)
        early_stop_patience_scale=2 if use_self_att else 1,
    )


register_model("KHGRec")(_build_khgrec_like("KHGRec"))
# The reference registry advertises KHGRec_variation1..9 (main.py:100)
# but ships no model files or conf files for them — they would crash at
# the exec-import (SELFRec.py:39), like the HGNN name. Register them as
# aliases of KHGRec so every advertised name resolves here; variation
# behavior is expressed via --mode / hyperparameters, not separate code.
for _i in range(1, 10):
    register_model(f"KHGRec_variation{_i}")(_build_khgrec_like("KHGRec"))
register_model("HGNN")(_build_khgrec_like("HGNN", use_self_att=True,
                                          kg_att_adj=False))
register_model("HD2")(_build_khgrec_like("HD2", use_self_att=True, force_no_ssl=True))
register_model("HGNNAblation")(_build_khgrec_like("HGNNAblation", hyper_from_mode=True))
