"""LightGCN — K-layer normalised-adjacency propagation, mean of layer
outputs. Parity with reference model/graph/LightGCN.py:104-140.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import Config
from ..data.device import CFDeviceData
from ..ops.losses import bpr_loss, l2_reg_loss
from ..ops.sparse import spmm_pair
from .base import ModelBundle, register_model


class LightGCNModule(nn.Module):
    n_users: int
    n_items: int
    dim: int
    n_layers: int

    @nn.compact
    def __call__(self, cf: CFDeviceData):
        u = self.param("user_emb", nn.initializers.xavier_uniform(), (self.n_users, self.dim))
        i = self.param("item_emb", nn.initializers.xavier_uniform(), (self.n_items, self.dim))
        ego = jnp.concatenate([u, i], axis=0)
        # K-layer propagation, mean over [ego, layer1..layerK]
        # (LightGCN.py:129-140)
        outs = [ego]
        for _ in range(self.n_layers):
            ego = spmm_pair(cf.adj.fwd, cf.adj.bwd, ego)
            outs.append(ego)
        all_emb = jnp.mean(jnp.stack(outs, axis=1), axis=1)
        return all_emb[: self.n_users], all_emb[self.n_users :]


@register_model("LightGCN")
def build_lightgcn(cfg: Config, cf: CFDeviceData, kg=None) -> ModelBundle:
    module = LightGCNModule(cf.n_users, cf.n_items, cfg.embedding_size, cfg.n_layers)

    def init(rng):
        return module.init(rng, cf), ()

    def batch_loss(params, extras, batch, rng):
        users, pos, neg = batch
        u_emb, i_emb = module.apply(params, cf)
        ue, pe, ne = u_emb[users], i_emb[pos], i_emb[neg]
        rec = bpr_loss(ue, pe, ne)
        reg = l2_reg_loss(cfg.reg, ue, pe, ne) / cfg.batch_size
        return rec + reg, {"rec_loss": rec, "reg_loss": reg}

    def encode_eval(params, extras):
        return module.apply(params, cf)

    return ModelBundle(
        name="LightGCN",
        cfg=cfg,
        cf=cf,
        kg=None,
        uses_kg=False,
        init=init,
        batch_loss=batch_loss,
        encode_eval=encode_eval,
        # plain Adam at fixed lr — the reference never instantiates the
        # scheduler it imports (LightGCN.py:37)
        lr_plateau=False,
    )
