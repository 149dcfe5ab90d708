"""DHCF — dual-channel hypergraph collaborative filtering.

Parity with reference model/graph/DHCF.py:135-199: per layer, user
embeddings get a two-hop conv through the RAW U x I incidence
(H (H^T u)) and items through H^T (H i); layer outputs are
jump-concatenated with the ego embeddings ([d * (K+1)] final dims).
Reference quirks kept: each layer convolves the ORIGINAL ego embeddings
(layers are not chained, DHCF.py:176-181) and the fc_u/fc_i Linears are
dead parameters (never used in forward) — omitted here.
Loss: BPR + l2_reg/batch (DHCF.py:70-72).

TPU redesign: the reference densifies the incidence
(`convert_...to_tensor(adj).to_dense()`, DHCF.py:141); here it stays a
padded-COO two-hop (survey 7.3 "dense-incidence habits").
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..core.config import Config
from ..data.device import CFDeviceData
from ..ops.losses import bpr_loss, l2_reg_loss
from ..ops.sparse import two_hop
from .base import ModelBundle, register_model
from .layers import leaky


class DHCFModule(nn.Module):
    n_users: int
    n_items: int
    dim: int
    n_layers: int
    slope: float

    @nn.compact
    def __call__(self, cf: CFDeviceData):
        u = self.param("user_emb", nn.initializers.xavier_uniform(), (self.n_users, self.dim))
        i = self.param("item_emb", nn.initializers.xavier_uniform(), (self.n_items, self.dim))
        user_embeds = [u]
        item_embeds = [i]
        for _ in range(self.n_layers):
            hu = leaky(two_hop(cf.raw_int.fwd, cf.raw_int.bwd, u), self.slope)
            hi = leaky(two_hop(cf.raw_int.bwd, cf.raw_int.fwd, i), self.slope)
            user_embeds.append(hu)
            item_embeds.append(hi)
        return jnp.concatenate(user_embeds, axis=1), jnp.concatenate(item_embeds, axis=1)


@register_model("DHCF")
def build_dhcf(cfg: Config, cf: CFDeviceData, kg=None) -> ModelBundle:
    module = DHCFModule(cf.n_users, cf.n_items, cfg.hyper_dim, cfg.n_layers, cfg.p)

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
        name="DHCF", cfg=cfg, cf=cf, kg=None, uses_kg=False,
        init=init, batch_loss=batch_loss, encode_eval=encode_eval,
    )
