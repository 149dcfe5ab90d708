"""SGL — self-supervised graph learning on LightGCN.

Parity with reference model/graph/SGL.py: two augmented graph views
drawn once per epoch (node- or edge-dropout on the interaction matrix,
then bipartite re-normalisation — SGL.py:61-62,131-147), LightGCN
propagation per view, InfoNCE between unique batch users+items across
views (SGL.py:168-180), loss = BPR + l2_reg (NOT /batch) + cl_rate * CL,
global-norm grad clip 4 (SGL.py:76).

TPU redesign: dropout is a value-mask over interaction-edge ids that
propagates to both bipartite directions through `bip_src`, and the
re-normalisation recomputes degrees on device (static shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import Config
from ..data.device import CFDeviceData
from ..ops.losses import bpr_loss, info_nce_masked, l2_reg_loss, unique_mask
from ..core.types import with_new_vals
from ..ops.sparse import renormalize_sym, spmm
from .base import ModelBundle, register_model


class SGLModule(nn.Module):
    n_users: int
    n_items: int
    dim: int
    n_layers: int

    @nn.compact
    def __call__(self, cf: CFDeviceData, view_vals: jnp.ndarray | None = None):
        u = self.param("user_emb", nn.initializers.xavier_uniform(), (self.n_users, self.dim))
        i = self.param("item_emb", nn.initializers.xavier_uniform(), (self.n_items, self.dim))
        ego = jnp.concatenate([u, i], axis=0)
        adj = cf.adj.fwd if view_vals is None else with_new_vals(cf.raw_adj.fwd, view_vals)
        outs = [ego]
        for _ in range(self.n_layers):
            ego = spmm(adj, ego)
            outs.append(ego)
        all_emb = jnp.mean(jnp.stack(outs, axis=1), axis=1)
        return all_emb[: self.n_users], all_emb[self.n_users :]


def _augmented_view_vals(rng: jax.Array, cf: CFDeviceData, drop_rate: float, aug_type: int) -> jnp.ndarray:
    """Normalised bipartite values for one augmented view (per epoch)."""
    n_int = cf.raw_int.fwd.nnz
    if aug_type == 0:
        # node dropout on the interaction matrix (augmentor.py:11-25)
        ku, ki = jax.random.split(rng)
        keep_u = jax.random.bernoulli(ku, 1.0 - drop_rate, (cf.n_users,))
        keep_i = jax.random.bernoulli(ki, 1.0 - drop_rate, (cf.n_items,))
        rows = jnp.clip(cf.raw_int.fwd.rows, 0, cf.n_users - 1)
        cols = jnp.clip(cf.raw_int.fwd.cols, 0, cf.n_items - 1)
        edge_keep = keep_u[rows] & keep_i[cols]
    else:
        # edge dropout, NO rescale (augmentor.py:27-40)
        edge_keep = jax.random.bernoulli(rng, 1.0 - drop_rate, cf.raw_int.fwd.vals.shape)
    int_vals = cf.raw_int.fwd.vals * edge_keep.astype(cf.raw_int.fwd.vals.dtype)
    bip_vals = int_vals[cf.bip_src]
    return renormalize_sym(with_new_vals(cf.raw_adj.fwd, bip_vals)).vals


@register_model("SGL")
def build_sgl(cfg: Config, cf: CFDeviceData, kg=None) -> ModelBundle:
    module = SGLModule(cf.n_users, cf.n_items, cfg.embedding_size, cfg.n_layers)

    def init(rng):
        params = module.init(rng, cf)
        nv = cf.raw_adj.fwd.vals.shape[0]
        extras = {"view1": jnp.zeros(nv), "view2": jnp.zeros(nv)}
        return params, extras

    def epoch_setup(params, extras, rng):
        k1, k2 = jax.random.split(rng)
        return {
            "view1": _augmented_view_vals(k1, cf, cfg.drop_rate, cfg.aug_type),
            "view2": _augmented_view_vals(k2, cf, cfg.drop_rate, cfg.aug_type),
        }

    def batch_loss(params, extras, batch, rng):
        users, pos, neg = batch
        u_emb, i_emb = module.apply(params, cf)
        ue, pe, ne = u_emb[users], i_emb[pos], i_emb[neg]
        rec = bpr_loss(ue, pe, ne)
        reg = l2_reg_loss(cfg.reg, ue, pe, ne)

        u1, i1 = module.apply(params, cf, extras["view1"])
        u2, i2 = module.apply(params, cf, extras["view2"])
        uu, um = unique_mask(users)
        iu, im = unique_mask(pos)
        view1 = jnp.concatenate([u1[uu], i1[iu]], axis=0)
        view2 = jnp.concatenate([u2[uu], i2[iu]], axis=0)
        valid = jnp.concatenate([um, im], axis=0)
        cl = cfg.cl_rate * info_nce_masked(view1, view2, valid, cfg.temp)
        return rec + reg + cl, {"rec_loss": rec, "cl_loss": cl}

    def encode_eval(params, extras):
        return module.apply(params, cf)

    return ModelBundle(
        name="SGL", cfg=cfg, cf=cf, kg=None, uses_kg=False,
        init=init, batch_loss=batch_loss, encode_eval=encode_eval,
        epoch_setup=epoch_setup, grad_clip_norm=4.0,
        # reference SGL never steps a scheduler (fixed-lr Adam)
        lr_plateau=False,
    )
