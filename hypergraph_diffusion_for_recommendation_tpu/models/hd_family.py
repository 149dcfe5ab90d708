"""The hypergraph-diffusion (HD) model family — the reference repo's
core contribution (survey 2.5): HD, HD-variants, HGNN_HD1-4, WaveletHD,
LocalEncoder.

All variants share one skeleton (HGNN_HD3.py:268-523):
  * LocalAwareEncoder: K x [ED-HNN EquivSetGNN layer + residual], with
    the LAST layer optionally swapped for LN(HGCNConv(act=False)) + res;
  * GroupAwareEncoder: K-1 x [user-side HWNN wavelet + item-side HWNN
    wavelet + residuals], last layer LN(HGCNConv(act=False)) + res;
  * modes full / local_only / group_only (HGNN_HD3.py:69-84);
  * eval embeddings: mean of the two views in 'full' mode
    (HGNN_HD3.py:260-264);
  * loss: BPR + l2/batch + cl_rate * cross-view contrastLoss
    (HGNN_HD3.py:343-350).

Variant matrix (each reference file differs only in the conv form and
whether the last local layer is an HGCN cap):
  HD        scatter-form ED-HNN, no HGCN cap        (HD.py:435-487)
  HGNN_HD   SpMM-form ED-HNN, no HGCN cap           (HGNN_HD.py:440-491)
  HGNN_HD2  scatter-form ED-HNN (EquivSetGNN2)      (HGNN_HD2.py)
  HGNN_HD3  dual-view full model                    (HGNN_HD3.py)
  HGNN_HD4  HD3 with lighter encoders               (HGNN_HD4.py:337-434)
  WaveletHD ED-HNN with HWNN inner conv             (WaveletHD.py:346-417)
  WaveletHD2 same, HGCN cap                         (WaveletHD2.py)
  LocalEncoder local-only HD3                       (LocalEncoder.py)

Documented deviations from the reference (survey 7.4):
  * the second SSL term contrasts local vs group ITEM views; the
    reference compares the group view with ITSELF (HGNN_HD3.py:348-349,
    an evident copy bug);
  * GroupAwareEncoder applies the wavelet Theta on the correct-side
    operators (Theta_uu = B B^T, Theta_ii = B^T B); the reference's
    group path builds (U+I)^2 polynomials against U-sized features
    (wavelet.py:90,130 vs HGNN_HD3.py:505-507), which cannot run.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import Config
from ..data.device import CFDeviceData
from ..ops.losses import bpr_loss, contrast_loss_pregathered, l2_reg_loss, unique_mask
from .base import ModelBundle, register_model
from .layers import EquivSetConvScatter, EquivSetGNN, HWNNLayer, hgcn_conv


class LocalAwareEncoder(nn.Module):
    n_users: int
    n_items: int
    dim: int
    n_layers: int
    drop_rate: float
    conv_form: str = "spmm"  # 'spmm' | 'scatter' | 'wavelet'
    last_hgcn: bool = True

    @nn.compact
    def __call__(self, ego: jnp.ndarray, adj, train: bool = False):
        res = ego
        n_nodes = self.n_users + self.n_items
        for k in range(self.n_layers):
            is_last = k == self.n_layers - 1
            if self.last_hgcn and is_last:
                ego = nn.LayerNorm()(hgcn_conv(adj, ego, 0.3, act=False)) + res
            elif self.conv_form == "scatter":
                conv = EquivSetConvScatter(
                    self.dim, n_edges=n_nodes, aggr="mean",
                    mlp1_layers=0, mlp2_layers=0, mlp3_layers=1,
                    alpha=0.0, dropout=self.drop_rate, normalization="ln", input_norm=True,
                )
                ego = conv(ego, adj, ego, train) + res
            else:
                inner = "wavelet" if self.conv_form == "wavelet" else "hgcn"
                gnn = EquivSetGNN(
                    self.dim, n_conv_layers=1, input_dropout=0.6, dropout=0.5,
                    alpha=0.0, mlp1_layers=0, mlp2_layers=0, mlp3_layers=1, inner=inner,
                )
                ego = gnn(ego, adj, train) + res
        return ego[: self.n_users], ego[self.n_users :]


class GroupAwareEncoder(nn.Module):
    n_users: int
    n_items: int
    dim: int
    n_layers: int

    @nn.compact
    def __call__(self, ego: jnp.ndarray, cf: CFDeviceData, adj, train: bool = False):
        res = ego
        res_u = ego[: self.n_users]
        res_i = ego[self.n_users :]
        for k in range(self.n_layers):
            if k != self.n_layers - 1:
                u_ego = HWNNLayer(self.n_users, self.dim, side="u")(
                    ego[: self.n_users], cf.b_hyper, train
                ) + res_u
                i_ego = HWNNLayer(self.n_items, self.dim, side="i")(
                    ego[self.n_users :], cf.b_hyper, train
                ) + res_i
                ego = jnp.concatenate([u_ego, i_ego], axis=0)
            else:
                ego = nn.LayerNorm()(hgcn_conv(adj, ego, 0.5, act=False)) + res
        return ego[: self.n_users], ego[self.n_users :]


class HDModule(nn.Module):
    n_users: int
    n_items: int
    dim: int
    n_layers: int
    drop_rate: float
    conv_form: str
    last_hgcn: bool
    use_local: bool
    use_group: bool

    def setup(self):
        self.user_emb = self.param(
            "user_emb", nn.initializers.xavier_uniform(), (self.n_users, self.dim)
        )
        self.item_emb = self.param(
            "item_emb", nn.initializers.xavier_uniform(), (self.n_items, self.dim)
        )
        if self.use_local:
            self.local_enc = LocalAwareEncoder(
                self.n_users, self.n_items, self.dim, self.n_layers,
                self.drop_rate, self.conv_form, self.last_hgcn,
            )
        if self.use_group:
            self.group_enc = GroupAwareEncoder(self.n_users, self.n_items, self.dim, self.n_layers)

    def _ego(self):
        return jnp.concatenate([self.user_emb, self.item_emb], axis=0)

    def __call__(self, cf: CFDeviceData, mode: str, keep_rate: float = 1.0, train: bool = False):
        adj = cf.adj
        if train and keep_rate < 1.0:
            adj = adj.dropped(self.make_rng("edges"), keep_rate)
        if mode == "local":
            return self.local_enc(self._ego(), adj, train)
        return self.group_enc(self._ego(), cf, adj, train)

    def init_all(self, cf: CFDeviceData):
        """Touch every enabled encoder so init creates all params."""
        ego = self._ego()
        if self.use_local:
            self.local_enc(ego, cf.adj, False)
        if self.use_group:
            self.group_enc(ego, cf, cf.adj, False)


def _build_hd_variant(
    name: str,
    conv_form: str,
    last_hgcn: bool,
    dual_view_default: bool,
):
    def builder(cfg: Config, cf: CFDeviceData, kg=None) -> ModelBundle:
        if dual_view_default:
            use_local = cfg.mode != "group_only"
            use_group = cfg.mode != "local_only"
            use_ssl = cfg.mode not in ("local_only", "group_only", "wossl")
        else:
            use_local, use_group, use_ssl = True, False, False

        module = HDModule(
            cf.n_users, cf.n_items, cfg.hyper_dim, cfg.n_layers, cfg.drop_rate,
            conv_form, last_hgcn, use_local, use_group,
        )
        keep = 1.0 - cfg.drop_rate

        def _encode(params, rng, train):
            rngs = None
            if train:
                k_e, k_d = jax.random.split(rng)
                rngs = {"edges": k_e, "dropout": k_d}
            views = []
            if use_local:
                views.append(
                    module.apply(params, cf, "local", keep if train else 1.0, train, rngs=rngs)
                )
            if use_group:
                views.append(
                    module.apply(params, cf, "group", keep if train else 1.0, train, rngs=rngs)
                )
            if len(views) == 1:
                return views[0], views
            u = jnp.mean(jnp.stack([v[0] for v in views], axis=1), axis=1)
            i = jnp.mean(jnp.stack([v[1] for v in views], axis=1), axis=1)
            return (u, i), views

        # cached-propagation training (core/config.py prop_cache_steps):
        # same design as the KHGRec flagship (models/khgrec.py) — the
        # full dual-view diffusion (the nnz-scaling ~95% of step cost at
        # multi-M scale, BENCH_NOTES) runs every K-th step and refreshes
        # cached view tables; steps between train on them with
        # straight-through gradients into the embedding tables.
        K_cache = max(int(getattr(cfg, "prop_cache_steps", 0) or 0), 0)
        use_prop_cache = K_cache > 1
        ssl_two_views = use_ssl and use_local and use_group

        def init(rng):
            params = module.init(
                {"params": rng, "edges": rng, "dropout": rng}, cf, method=HDModule.init_all
            )
            if not use_prop_cache:
                return params, ()
            d = cfg.hyper_dim
            extras = {
                "prop_age": jnp.zeros((), jnp.int32),
                "prop_u": jnp.zeros((cf.n_users, d), jnp.float32),
                "prop_i": jnp.zeros((cf.n_items, d), jnp.float32),
            }
            if ssl_two_views:
                extras.update(
                    prop_lu=jnp.zeros((cf.n_users, d), jnp.float32),
                    prop_li=jnp.zeros((cf.n_items, d), jnp.float32),
                    prop_gu=jnp.zeros((cf.n_users, d), jnp.float32),
                    prop_gi=jnp.zeros((cf.n_items, d), jnp.float32),
                )
            return params, extras

        def full_loss(params, extras, batch, rng):
            users, pos, neg = batch
            (u_emb, i_emb), views = _encode(params, rng, train=True)
            ue, pe, ne = u_emb[users], i_emb[pos], i_emb[neg]
            rec = bpr_loss(ue, pe, ne)
            reg = l2_reg_loss(cfg.reg, ue, pe, ne) / cfg.batch_size
            aux = {"rec_loss": rec, "reg_loss": reg}
            loss = rec + reg
            if use_ssl and len(views) == 2:
                (lu, li), (gu, gi) = views
                uu, um = unique_mask(users)
                iu, im = unique_mask(pos)
                # one gather per view (users+items stacked); numerics
                # match the full-array contrast form (see ops/losses.py)
                ids = jnp.concatenate([uu, lu.shape[0] + iu])
                b = users.shape[0]
                lv = jnp.concatenate([lu, li], axis=0)[ids]
                gv = jnp.concatenate([gu, gi], axis=0)[ids]
                ssl = contrast_loss_pregathered(lv[:b], gv[:b], um, cfg.temp)
                ssl = ssl + contrast_loss_pregathered(lv[b:], gv[b:], im, cfg.temp)
                ssl = cfg.cl_rate * ssl
                aux["cl_loss"] = ssl
                loss = loss + ssl
            if use_prop_cache:
                sg = jax.lax.stop_gradient
                new_extras = {
                    "prop_age": extras["prop_age"] + 1,
                    "prop_u": sg(u_emb), "prop_i": sg(i_emb),
                }
                if ssl_two_views:
                    (lu, li), (gu, gi) = views
                    new_extras.update(prop_lu=sg(lu), prop_li=sg(li),
                                      prop_gu=sg(gu), prop_gi=sg(gi))
                aux["_new_extras"] = new_extras
            return loss, aux

        def cached_loss(params, extras, batch, rng):
            """Between-refresh step: the same losses on cached view rows
            with a straight-through identity path into the embedding
            tables (each view carries the ego residual, so the own-row
            component is a true Jacobian term — see models/khgrec.py)."""
            users, pos, neg = batch
            p = params["params"]
            u_tab, i_tab = p["user_emb"], p["item_emb"]

            def st(prop_rows, ego_rows):
                return prop_rows + ego_rows - jax.lax.stop_gradient(ego_rows)

            ue = st(extras["prop_u"][users], u_tab[users])
            pe = st(extras["prop_i"][pos], i_tab[pos])
            ne = st(extras["prop_i"][neg], i_tab[neg])
            rec = bpr_loss(ue, pe, ne)
            reg = l2_reg_loss(cfg.reg, ue, pe, ne) / cfg.batch_size
            aux = {"rec_loss": rec, "reg_loss": reg}
            loss = rec + reg
            if ssl_two_views:
                uu, um = unique_mask(users)
                iu, im = unique_mask(pos)
                lu_v = st(extras["prop_lu"][uu], u_tab[uu])
                gu_v = st(extras["prop_gu"][uu], u_tab[uu])
                li_v = st(extras["prop_li"][iu], i_tab[iu])
                gi_v = st(extras["prop_gi"][iu], i_tab[iu])
                ssl = contrast_loss_pregathered(lu_v, gu_v, um, cfg.temp)
                ssl = ssl + contrast_loss_pregathered(li_v, gi_v, im, cfg.temp)
                ssl = cfg.cl_rate * ssl
                aux["cl_loss"] = ssl
                loss = loss + ssl
            aux["_new_extras"] = {
                **{k: extras[k] for k in extras if k != "prop_age"},
                "prop_age": extras["prop_age"] + 1,
            }
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
            (u_emb, i_emb), _ = _encode(params, jax.random.PRNGKey(0), train=False)
            return u_emb, i_emb

        return ModelBundle(
            name=name, cfg=cfg, cf=cf, kg=None, uses_kg=False,
            init=init, batch_loss=batch_loss, encode_eval=encode_eval,
        )

    return builder


register_model("HD")(_build_hd_variant("HD", "scatter", last_hgcn=False, dual_view_default=False))
register_model("HGNN_HD")(_build_hd_variant("HGNN_HD", "spmm", last_hgcn=False, dual_view_default=False))
register_model("HGNN_HD2")(_build_hd_variant("HGNN_HD2", "scatter", last_hgcn=True, dual_view_default=False))
register_model("HGNN_HD3")(_build_hd_variant("HGNN_HD3", "spmm", last_hgcn=True, dual_view_default=True))
register_model("HGNN_HD4")(_build_hd_variant("HGNN_HD4", "spmm", last_hgcn=False, dual_view_default=True))
register_model("WaveletHD")(_build_hd_variant("WaveletHD", "wavelet", last_hgcn=False, dual_view_default=False))
register_model("WaveletHD2")(_build_hd_variant("WaveletHD2", "wavelet", last_hgcn=True, dual_view_default=False))
register_model("LocalEncoder")(_build_hd_variant("LocalEncoder", "spmm", last_hgcn=True, dual_view_default=False))
