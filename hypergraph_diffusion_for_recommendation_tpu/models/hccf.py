"""HCCF — hypergraph-contrastive collaborative filtering.

Parity with reference model/graph/HCCF.py:135-226:
  * GCN branch: one-hop A_drop @ h on the edge-dropped normalised
    bipartite adjacency;
  * hyperedge branch: learnable dense incidence E_u = U W_u [U, E],
    feature-dropout'd, applied as H (H^T h) (HGNNLayer :203-211);
  * hidden_{k+1} = gcn_k + hgnn_k; final = sum of all hidden;
  * loss = BPR + ss_rate * sum_k contrastLoss(gcn_k.detach(), hgnn_k)
    over unique batch users and items (:59-68); grad clip 4 (:94).

Deviation (documented): the reference passes EMBEDDINGS where node ids
are expected (`torch.unique(ancs.long())` with ancs = anchor_emb,
HCCF.py:65-66), indexing the contrast loss with integer-cast embedding
values. We use the intended unique batch USER/ITEM indices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import Config
from ..data.device import CFDeviceData
from ..ops.losses import bpr_loss, contrast_loss_pregathered, unique_mask
from ..ops.sparse import spmm
from .base import ModelBundle, register_model


class HCCFModule(nn.Module):
    n_users: int
    n_items: int
    dim: int
    n_edges: int
    n_layers: int
    drop_rate: float

    @nn.compact
    def __call__(self, cf: CFDeviceData, keep_rate: float = 1.0, train: bool = False):
        u = self.param("user_emb", nn.initializers.xavier_uniform(), (self.n_users, self.dim))
        i = self.param("item_emb", nn.initializers.xavier_uniform(), (self.n_items, self.dim))
        user_w = self.param("user_w", nn.initializers.xavier_uniform(), (self.dim, self.n_edges))
        item_w = self.param("item_w", nn.initializers.xavier_uniform(), (self.dim, self.n_edges))

        hyper_uu = u @ user_w  # [U, E] learnable incidence
        hyper_ii = i @ item_w
        drop = nn.Dropout(self.drop_rate, deterministic=not train)
        hidden = [jnp.concatenate([u, i], axis=0)]
        gcn_hidden, hgnn_hidden = [], []
        for k in range(self.n_layers):
            if train and keep_rate < 1.0:
                rng = self.make_rng("edges")
                adj = cf.adj.dropped(rng, keep_rate).fwd
            else:
                adj = cf.adj.fwd
            gcn_emb = spmm(adj, hidden[-1])
            huu = drop(hyper_uu)
            hii = drop(hyper_ii)
            hu = huu @ (huu.T @ hidden[-1][: self.n_users])
            hi = hii @ (hii.T @ hidden[-1][self.n_users :])
            hyper_emb = jnp.concatenate([hu, hi], axis=0)
            gcn_hidden.append(gcn_emb)
            hgnn_hidden.append(hyper_emb)
            hidden.append(gcn_emb + hyper_emb)
        total = sum(hidden)
        return total[: self.n_users], total[self.n_users :], gcn_hidden, hgnn_hidden


@register_model("HCCF")
def build_hccf(cfg: Config, cf: CFDeviceData, kg=None) -> ModelBundle:
    module = HCCFModule(
        cf.n_users, cf.n_items, cfg.embedding_size, cfg.hyper_dim, cfg.n_layers, cfg.drop_rate
    )

    def init(rng):
        params = module.init({"params": rng}, cf)
        return params, ()

    def batch_loss(params, extras, batch, rng):
        users, pos, neg = batch
        k_edge, k_drop = jax.random.split(rng)
        u_emb, i_emb, gcn_h, hgnn_h = module.apply(
            params, cf, keep_rate=1.0 - cfg.drop_rate, train=True,
            rngs={"edges": k_edge, "dropout": k_drop},
        )
        ue, pe, ne = u_emb[users], i_emb[pos], i_emb[neg]
        rec = bpr_loss(ue, pe, ne)
        uu, um = unique_mask(users)
        iu, im = unique_mask(pos)
        # one gather per view per layer (users+items stacked); row
        # -normalisation commutes with the gather so numerics match the
        # full-array contrast_loss_masked form
        ids = jnp.concatenate([uu, cf.n_users + iu])
        b = users.shape[0]
        ssl = 0.0
        for g, h in zip(gcn_h, hgnn_h):
            g = jax.lax.stop_gradient(g)  # reference detaches the GCN side (:63)
            gv, hv = g[ids], h[ids]
            ssl = ssl + contrast_loss_pregathered(gv[:b], hv[:b], um, cfg.temp)
            ssl = ssl + contrast_loss_pregathered(gv[b:], hv[b:], im, cfg.temp)
        ssl = cfg.cl_rate * ssl
        return rec + ssl, {"rec_loss": rec, "cl_loss": ssl}

    def encode_eval(params, extras):
        u_emb, i_emb, _, _ = module.apply(params, cf)
        return u_emb, i_emb

    return ModelBundle(
        name="HCCF", cfg=cfg, cf=cf, kg=None, uses_kg=False,
        init=init, batch_loss=batch_loss, encode_eval=encode_eval,
        grad_clip_norm=4.0,
        # HCCF's recall trajectory peaks early (~ep 13), dips for ~22
        # epochs, then climbs well past the early peak — a measured
        # trough LONGER than the usual patience-15, so raw (and
        # smoothed: results/stopping_rule_ab/RESULTS.md) stopping
        # abandons unlucky seeds in the dip (1-in-9 seeds at 0.196 vs
        # the 0.28-0.30 cluster; the same seed reaches 0.295 with
        # stopping disabled). x2 patience rides out the trough — same
        # product call as the self-att models (khgrec.py:405).
        early_stop_patience_scale=2,
    )
