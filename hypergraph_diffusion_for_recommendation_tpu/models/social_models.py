"""Social recommenders: MHCN and SEPT.

Registered in the reference CLI (main.py:102) on the social data path
(`Relation`, data/social.py) but — like the other SELFRec imports —
their model files were not committed. Compact TPU-native versions from
the upstream formulations:

  MHCN  three motif channels (social, joint = mutual-follow, purchase
        = co-interaction), per-channel LightGCN-style propagation over
        the user graph, softmax channel attention, + self-supervised
        user-vs-channel mutual-information term;
  SEPT  main interaction encoder + friend/sharing social view encoders,
        cross-view InfoNCE on batch users.

Social adjacencies are precomputed host-side with scipy (motif products
are init-time, survey-consistent) and propagated as padded-COO SpMMs.
When no social file is provided the CLI builds a taste-correlated
synthetic trust network (data/social.py:synthetic_social).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import Config
from ..data.device import AdjPair, CFDeviceData, adj_pair_from_scipy
from ..data.normalize import normalize_graph_mat
from ..ops.losses import bpr_loss, info_nce_masked, l2_reg_loss, unique_mask
from ..ops.sparse import spmm_pair
from .base import ModelBundle, register_model


def _social_channels(cf: CFDeviceData, social_mat) -> dict[str, AdjPair]:
    import scipy.sparse as sp

    s = social_mat.tocsr()
    s_sym = (s + s.T).tocsr()
    s_sym.data[:] = 1.0
    mutual = s.multiply(s.T).tocsr()
    # purchase channel: users co-interacting (binarised co-occurrence)
    r = cf_interaction_csr(cf)
    co = (r @ r.T).tocsr()
    co.setdiag(0)
    co.eliminate_zeros()
    co.data[:] = 1.0
    return {
        "social": adj_pair_from_scipy(normalize_graph_mat(s_sym)),
        "joint": adj_pair_from_scipy(normalize_graph_mat(mutual + sp.eye(cf.n_users))),
        "purchase": adj_pair_from_scipy(normalize_graph_mat(co + sp.eye(cf.n_users))),
    }


def cf_interaction_csr(cf: CFDeviceData):
    import scipy.sparse as sp

    u = np.asarray(cf.edge_u)
    i = np.asarray(cf.edge_i)
    return sp.csr_matrix(
        (np.ones(len(u), np.float32), (u, i)), shape=(cf.n_users, cf.n_items)
    )


class MHCNModule(nn.Module):
    n_users: int
    n_items: int
    dim: int
    n_layers: int

    @nn.compact
    def __call__(self, cf: CFDeviceData, channels: dict):
        u = self.param("user_emb", nn.initializers.xavier_uniform(), (self.n_users, self.dim))
        i = self.param("item_emb", nn.initializers.xavier_uniform(), (self.n_items, self.dim))
        att = self.param("channel_att", nn.initializers.xavier_uniform(), (len(channels), self.dim))

        chan_outs = []
        for k, (name, adj) in enumerate(sorted(channels.items())):
            h = u
            outs = [h]
            for _ in range(self.n_layers):
                h = spmm_pair(adj.fwd, adj.bwd, h)
                outs.append(h)
            chan_outs.append(jnp.mean(jnp.stack(outs, 1), 1))
        stack = jnp.stack(chan_outs, axis=1)  # [U, C, d]
        logits = jnp.einsum("ucd,cd->uc", stack, att)
        w = jax.nn.softmax(logits, axis=1)
        user_final = jnp.einsum("uc,ucd->ud", w, stack) + u
        # items aggregate their raters' fused embeddings
        item_agg = spmm_pair(cf.inv_int_norm.fwd, cf.inv_int_norm.bwd, user_final)
        item_final = i + item_agg
        return user_final, item_final, chan_outs


@register_model("MHCN")
def build_mhcn(cfg: Config, cf: CFDeviceData, kg=None, social=None) -> ModelBundle:
    assert social is not None, "MHCN requires social data (pass social=SocialData)"
    channels = _social_channels(cf, social.social_mat)
    module = MHCNModule(cf.n_users, cf.n_items, cfg.embedding_size, cfg.n_layers)

    def init(rng):
        return module.init(rng, cf, channels), ()

    def batch_loss(params, extras, batch, rng):
        users, pos, neg = batch
        u_emb, i_emb, chans = module.apply(params, cf, channels)
        ue, pe, ne = u_emb[users], i_emb[pos], i_emb[neg]
        rec = bpr_loss(ue, pe, ne)
        reg = l2_reg_loss(cfg.reg, ue, pe, ne) / cfg.batch_size
        # hierarchical MI: fused user vs each channel view on batch users
        uu, um = unique_mask(users)
        ssl = 0.0
        for c in chans:
            ssl = ssl + info_nce_masked(u_emb[uu], c[uu], um, cfg.temp)
        ssl = cfg.cl_rate * ssl
        return rec + reg + ssl, {"rec_loss": rec, "cl_loss": ssl}

    def encode_eval(params, extras):
        u_emb, i_emb, _ = module.apply(params, cf, channels)
        return u_emb, i_emb

    return ModelBundle(
        name="MHCN", cfg=cfg, cf=cf, kg=None, uses_kg=False,
        init=init, batch_loss=batch_loss, encode_eval=encode_eval,
    )


class SEPTModule(nn.Module):
    n_users: int
    n_items: int
    dim: int
    n_layers: int

    @nn.compact
    def __call__(self, cf: CFDeviceData, friend: AdjPair, sharing: AdjPair):
        u = self.param("user_emb", nn.initializers.xavier_uniform(), (self.n_users, self.dim))
        i = self.param("item_emb", nn.initializers.xavier_uniform(), (self.n_items, self.dim))
        # main view: LightGCN over the bipartite graph
        ego = jnp.concatenate([u, i], axis=0)
        outs = [ego]
        for _ in range(self.n_layers):
            outs.append(spmm_pair(cf.adj.fwd, cf.adj.bwd, outs[-1]))
        main = jnp.mean(jnp.stack(outs, 1), 1)
        # friend + sharing views over user-user graphs
        def prop(adj, h):
            hs = [h]
            for _ in range(self.n_layers):
                hs.append(spmm_pair(adj.fwd, adj.bwd, hs[-1]))
            return jnp.mean(jnp.stack(hs, 1), 1)

        return (
            main[: self.n_users],
            main[self.n_users :],
            prop(friend, u),
            prop(sharing, u),
        )


@register_model("SEPT")
def build_sept(cfg: Config, cf: CFDeviceData, kg=None, social=None) -> ModelBundle:
    assert social is not None, "SEPT requires social data (pass social=SocialData)"
    import scipy.sparse as sp

    s = social.social_mat
    friend = adj_pair_from_scipy(normalize_graph_mat(((s + s.T) != 0).astype(np.float32).tocsr()))
    r = cf_interaction_csr(cf)
    share = (r @ r.T).tocsr()
    share.setdiag(0)
    share.eliminate_zeros()
    share.data[:] = 1.0
    sharing = adj_pair_from_scipy(normalize_graph_mat(share + sp.eye(cf.n_users)))
    module = SEPTModule(cf.n_users, cf.n_items, cfg.embedding_size, cfg.n_layers)

    def init(rng):
        return module.init(rng, cf, friend, sharing), ()

    def batch_loss(params, extras, batch, rng):
        users, pos, neg = batch
        u_emb, i_emb, fr, sh = module.apply(params, cf, friend, sharing)
        ue, pe, ne = u_emb[users], i_emb[pos], i_emb[neg]
        rec = bpr_loss(ue, pe, ne)
        reg = l2_reg_loss(cfg.reg, ue, pe, ne) / cfg.batch_size
        uu, um = unique_mask(users)
        ssl = info_nce_masked(u_emb[uu], fr[uu], um, cfg.temp)
        ssl = ssl + info_nce_masked(u_emb[uu], sh[uu], um, cfg.temp)
        ssl = cfg.cl_rate * ssl
        return rec + reg + ssl, {"rec_loss": rec, "cl_loss": ssl}

    def encode_eval(params, extras):
        u_emb, i_emb, _, _ = module.apply(params, cf, friend, sharing)
        return u_emb, i_emb

    return ModelBundle(
        name="SEPT", cfg=cfg, cf=cf, kg=None, uses_kg=False,
        init=init, batch_loss=batch_loss, encode_eval=encode_eval,
    )
