"""DHCF_diffusion — DHCF with ED-HNN diffusion channels.

Parity with reference model/graph/DHCF_diffusion.py:131-190 (intended
semantics): per layer, the user channel runs EquivSetGNN over the raw
U x I interaction incidence (users = vertices, items = hyperedges) and
the item channel over its transpose; layer outputs jump-concatenate
with the ego embeddings. Loss = BPR + l2_reg/batch.

Note: the reference's forward passes the arguments swapped
(`edgnn_u[idx](self.adj, uEmbed)`, DHCF_diffusion.py:179 — x and
hypergraph exchanged, missing n_nodes) and cannot run at HEAD
(survey 7.4); this is the evident intended call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import Config
from ..data.device import CFDeviceData
from ..ops.losses import bpr_loss, l2_reg_loss
from .base import ModelBundle, register_model
from .layers import EquivSetGNNScatter


class DHCFDiffusionModule(nn.Module):
    n_users: int
    n_items: int
    dim: int
    n_layers: int

    @nn.compact
    def __call__(self, cf: CFDeviceData, train: bool = False):
        u = self.param("user_emb", nn.initializers.xavier_uniform(), (self.n_users, self.dim))
        i = self.param("item_emb", nn.initializers.xavier_uniform(), (self.n_items, self.dim))
        user_embeds = [u]
        item_embeds = [i]
        for _ in range(self.n_layers):
            gnn_u = EquivSetGNNScatter(self.dim, n_edges=self.n_items)
            gnn_i = EquivSetGNNScatter(self.dim, n_edges=self.n_users)
            user_embeds.append(gnn_u(u, cf.raw_int, train))
            # item channel: incidence transposed (items = vertices)
            inc_t = cf.raw_int.replace(fwd=cf.raw_int.bwd, bwd=cf.raw_int.fwd)
            item_embeds.append(gnn_i(i, inc_t, train))
        return jnp.concatenate(user_embeds, axis=1), jnp.concatenate(item_embeds, axis=1)


@register_model("DHCF_diffusion")
def build_dhcf_diffusion(cfg: Config, cf: CFDeviceData, kg=None) -> ModelBundle:
    module = DHCFDiffusionModule(cf.n_users, cf.n_items, cfg.hyper_dim, cfg.n_layers)

    def init(rng):
        k1, k2 = jax.random.split(rng)
        return module.init({"params": k1, "dropout": k2}, cf), ()

    def batch_loss(params, extras, batch, rng):
        users, pos, neg = batch
        u_emb, i_emb = module.apply(params, cf, train=True, rngs={"dropout": rng})
        ue, pe, ne = u_emb[users], i_emb[pos], i_emb[neg]
        rec = bpr_loss(ue, pe, ne)
        reg = l2_reg_loss(cfg.reg, ue, pe, ne) / cfg.batch_size
        return rec + reg, {"rec_loss": rec, "reg_loss": reg}

    def encode_eval(params, extras):
        return module.apply(params, cf)

    return ModelBundle(
        name="DHCF_diffusion", cfg=cfg, cf=cf, kg=None, uses_kg=False,
        init=init, batch_loss=batch_loss, encode_eval=encode_eval,
    )
