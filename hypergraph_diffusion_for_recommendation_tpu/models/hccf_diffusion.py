"""HCCF_diffusion — HCCF with the hyperedge branch replaced by ED-HNN
diffusion over the dense learnable incidence.

Parity with reference model/graph/HCCF_diffusion.py:130-216: same GCN
branch and loss structure as HCCF, but per layer the user/item hyper
embeddings come from an EquivSetGNN applied to hidden[:U] with
incidence drop_out(U W_u) (resp. items), instead of the two dense
matmuls. The reference extracts dynamic V/E lists from `nonzero(H>0)`
(:317-341); the TPU form is the masked dense-matmul scatter-mean
(DenseEquivSetGNN, models/layers.py).
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
from .layers import DenseEquivSetGNN


class HCCFDiffusionModule(nn.Module):
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
        edhnn = DenseEquivSetGNN(self.dim, input_dropout=0.6, dropout=0.5, alpha=0.0)

        hyper_uu = u @ user_w
        hyper_ii = i @ item_w
        drop = nn.Dropout(self.drop_rate, deterministic=not train)
        hidden = [jnp.concatenate([u, i], axis=0)]
        gcn_hidden, hgnn_hidden = [], []
        for _ in range(self.n_layers):
            if train and keep_rate < 1.0:
                adj = cf.adj.dropped(self.make_rng("edges"), keep_rate).fwd
            else:
                adj = cf.adj.fwd
            gcn_emb = spmm(adj, hidden[-1])
            hu = edhnn(hidden[-1][: self.n_users], drop(hyper_uu), train)
            hi = edhnn(hidden[-1][self.n_users :], drop(hyper_ii), train)
            hyper_emb = jnp.concatenate([hu, hi], axis=0)
            gcn_hidden.append(gcn_emb)
            hgnn_hidden.append(hyper_emb)
            hidden.append(gcn_emb + hyper_emb)
        total = sum(hidden)
        return total[: self.n_users], total[self.n_users :], gcn_hidden, hgnn_hidden


@register_model("HCCF_diffusion")
def build_hccf_diffusion(cfg: Config, cf: CFDeviceData, kg=None) -> ModelBundle:
    module = HCCFDiffusionModule(
        cf.n_users, cf.n_items, cfg.embedding_size, cfg.hyper_dim, cfg.n_layers, cfg.drop_rate
    )

    def init(rng):
        k1, k2 = jax.random.split(rng)
        params = module.init({"params": k1, "dropout": k2}, cf)
        return params, ()

    def batch_loss(params, extras, batch, rng):
        users, pos, neg = batch
        k_edge, k_drop = jax.random.split(rng)
        u_emb, i_emb, gcn_h, hgnn_h = module.apply(
            params, cf, keep_rate=1.0 - cfg.drop_rate, train=True,
            rngs={"edges": k_edge, "dropout": k_drop},
        )
        rec = bpr_loss(u_emb[users], i_emb[pos], i_emb[neg])
        uu, um = unique_mask(users)
        iu, im = unique_mask(pos)
        # one gather per view per layer (see hccf.py note)
        ids = jnp.concatenate([uu, cf.n_users + iu])
        b = users.shape[0]
        ssl = 0.0
        for g, h in zip(gcn_h, hgnn_h):
            g = jax.lax.stop_gradient(g)
            gv, hv = g[ids], h[ids]
            ssl = ssl + contrast_loss_pregathered(gv[:b], hv[:b], um, cfg.temp)
            ssl = ssl + contrast_loss_pregathered(gv[b:], hv[b:], im, cfg.temp)
        ssl = cfg.cl_rate * ssl
        return rec + ssl, {"rec_loss": rec, "cl_loss": ssl}

    def encode_eval(params, extras):
        u_emb, i_emb, _, _ = module.apply(params, cf)
        return u_emb, i_emb

    return ModelBundle(
        name="HCCF_diffusion", cfg=cfg, cf=cf, kg=None, uses_kg=False,
        init=init, batch_loss=batch_loss, encode_eval=encode_eval,
        grad_clip_norm=4.0,
    )
