"""HGCN — UGformer-style transformer-over-nodes + two-hop hypergraph conv.

Parity with reference model/graph/HGCN.py:100-166: per layer, a 2-head
transformer-encoder pass over the whole node set, then HGCNConv on the
edge-dropped adjacency (activation off on the last layer); residual ego
added to the final layer only. Loss = BPR + l2_reg/batch (HGCN.py:51-53).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import Config
from ..data.device import CFDeviceData
from ..ops.losses import bpr_loss, l2_reg_loss
from .base import ModelBundle, register_model
from .layers import hgcn_conv


class TransformerEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer equivalent (post-norm flavour)."""

    dim: int
    n_heads: int = 2
    ff_dim: int = 32
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.dim, deterministic=not train
        )(x[None])[0]
        x = nn.LayerNorm()(x + nn.Dropout(self.dropout, deterministic=not train)(attn))
        ff = nn.Dense(self.ff_dim)(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        ff = nn.Dense(self.dim)(ff)
        x = nn.LayerNorm()(x + nn.Dropout(self.dropout, deterministic=not train)(ff))
        return nn.LayerNorm()(x)  # TransformerEncoder(norm=LayerNorm) (:127)


class HGCNModule(nn.Module):
    n_users: int
    n_items: int
    dim: int
    n_layers: int
    slope: float
    drop_rate: float

    @nn.compact
    def __call__(self, cf: CFDeviceData, keep_rate: float = 1.0, train: bool = False):
        u = self.param("user_emb", nn.initializers.xavier_uniform(), (self.n_users, self.dim))
        i = self.param("item_emb", nn.initializers.xavier_uniform(), (self.n_items, self.dim))
        ego = jnp.concatenate([u, i], axis=0)
        res = ego
        adj = cf.adj
        if train and keep_rate < 1.0:
            adj = adj.dropped(self.make_rng("edges"), keep_rate)
        for k in range(self.n_layers):
            ego = TransformerEncoderLayer(self.dim, 2, 32, self.drop_rate)(ego, train)
            ego = hgcn_conv(adj, ego, self.slope, act=(k != self.n_layers - 1))
        ego = ego + res
        return ego[: self.n_users], ego[self.n_users :]


@register_model("HGCN")
def build_hgcn(cfg: Config, cf: CFDeviceData, kg=None) -> ModelBundle:
    module = HGCNModule(
        cf.n_users, cf.n_items, cfg.hyper_dim, cfg.n_layers, cfg.p, cfg.drop_rate
    )

    def init(rng):
        return module.init({"params": rng}, cf), ()

    def batch_loss(params, extras, batch, rng):
        users, pos, neg = batch
        k_edge, k_drop = jax.random.split(rng)
        u_emb, i_emb = module.apply(
            params, cf, keep_rate=1.0 - cfg.drop_rate, train=True,
            rngs={"edges": k_edge, "dropout": k_drop},
        )
        ue, pe, ne = u_emb[users], i_emb[pos], i_emb[neg]
        rec = bpr_loss(ue, pe, ne)
        reg = l2_reg_loss(cfg.reg, ue, pe, ne) / cfg.batch_size
        return rec + reg, {"rec_loss": rec, "reg_loss": reg}

    def encode_eval(params, extras):
        return module.apply(params, cf)

    return ModelBundle(
        name="HGCN", cfg=cfg, cf=cf, kg=None, uses_kg=False,
        init=init, batch_loss=batch_loss, encode_eval=encode_eval,
    )
