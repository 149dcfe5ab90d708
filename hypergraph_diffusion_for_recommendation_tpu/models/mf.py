"""BPR matrix factorisation — the minimal end-to-end model.

Capability parity with the reference's `MF` registry entry
(main.py:99, conf/MF.conf): embedding tables + BPR + L2, full-catalog
eval. This is the survey 7.2 "minimum end-to-end slice".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import Config
from ..data.device import CFDeviceData
from ..ops.losses import bpr_loss, l2_reg_loss
from .base import ModelBundle, register_model


class MFModule(nn.Module):
    n_users: int
    n_items: int
    dim: int

    @nn.compact
    def __call__(self):
        u = self.param("user_emb", nn.initializers.xavier_uniform(), (self.n_users, self.dim))
        i = self.param("item_emb", nn.initializers.xavier_uniform(), (self.n_items, self.dim))
        return u, i


@register_model("MF")
def build_mf(cfg: Config, cf: CFDeviceData, kg=None) -> ModelBundle:
    module = MFModule(cf.n_users, cf.n_items, cfg.embedding_size)

    def init(rng):
        params = module.init(rng)
        return params, ()

    def encode(params):
        return module.apply(params)

    def batch_loss(params, extras, batch, rng):
        users, pos, neg = batch
        u_emb, i_emb = encode(params)
        ue, pe, ne = u_emb[users], i_emb[pos], i_emb[neg]
        rec = bpr_loss(ue, pe, ne)
        reg = l2_reg_loss(cfg.reg, ue, pe, ne) / cfg.batch_size
        return rec + reg, {"rec_loss": rec, "reg_loss": reg}

    def encode_eval(params, extras):
        return encode(params)

    return ModelBundle(
        name="MF",
        cfg=cfg,
        cf=cf,
        kg=None,
        uses_kg=False,
        init=init,
        batch_loss=batch_loss,
        encode_eval=encode_eval,
    )
