"""SELFRec SSL baselines: DirectAU, SimGCL, XSimGCL, NCL, MixGCF, SSL4Rec.

These appear in the reference's CLI registry (main.py:99-104) and ship
conf files, but their model files were not committed (survey 2.5
"inherited from upstream SELFRec but the .py files are absent"). They
are implemented here from the upstream SELFRec formulations so the
registry surface is complete:

  DirectAU  alignment + uniformity on an MF encoder
  SimGCL    LightGCN with per-layer signed random noise, two-view InfoNCE
  XSimGCL   single noisy forward, CL between final and an early layer
  NCL       LightGCN + structural (k-hop vs ego) and prototype
            (device k-means, refreshed per epoch) contrastive terms
  MixGCF    LightGCN + hop-mixing hardest-negative synthesis
  SSL4Rec   two-tower MF with feature-dropout augmented item InfoNCE
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import Config
from ..data.device import CFDeviceData
from ..ops.losses import (
    bpr_loss,
    info_nce_masked,
    l2_reg_loss,
    unique_mask,
)
from ..ops.sparse import spmm, spmm_pair as _spmm_pair
from .base import ModelBundle, register_model


class _Tables(nn.Module):
    n_users: int
    n_items: int
    dim: int

    @nn.compact
    def __call__(self):
        u = self.param("user_emb", nn.initializers.xavier_uniform(), (self.n_users, self.dim))
        i = self.param("item_emb", nn.initializers.xavier_uniform(), (self.n_items, self.dim))
        return u, i


def _lightgcn_forward(cf: CFDeviceData, u, i, n_layers, noise_rng=None, eps=0.0):
    """LightGCN propagation; optional SimGCL-style per-layer noise:
    e += eps * sign(e) * l2_normalize(uniform noise)."""
    ego = jnp.concatenate([u, i], axis=0)
    outs = [ego]
    rngs = jax.random.split(noise_rng, n_layers) if noise_rng is not None else [None] * n_layers
    for k in range(n_layers):
        ego = _spmm_pair(cf.adj.fwd, cf.adj.bwd, ego)
        if rngs[k] is not None:
            noise = jax.random.uniform(rngs[k], ego.shape)
            noise = noise * jax.lax.rsqrt(jnp.maximum(jnp.sum(noise**2, 1, keepdims=True), 1e-12))
            ego = ego + eps * jnp.sign(ego) * noise
        outs.append(ego)
    return outs


def _mean_split(cf, outs, skip_first=False):
    stack = jnp.stack(outs[1:] if skip_first else outs, axis=1)
    emb = jnp.mean(stack, axis=1)
    return emb[: cf.n_users], emb[cf.n_users :]


# ---------------------------------------------------------------- DirectAU
@register_model("DirectAU")
def build_directau(cfg: Config, cf: CFDeviceData, kg=None) -> ModelBundle:
    module = _Tables(cf.n_users, cf.n_items, cfg.embedding_size)
    gamma = cfg.cl_rate if cfg.cl_rate > 0 else 1.0

    def init(rng):
        return module.init(rng), ()

    def batch_loss(params, extras, batch, rng):
        users, pos, neg = batch
        u, i = module.apply(params)
        ue = u[users]
        pe = i[pos]
        un = ue * jax.lax.rsqrt(jnp.maximum(jnp.sum(ue**2, 1, keepdims=True), 1e-12))
        pn = pe * jax.lax.rsqrt(jnp.maximum(jnp.sum(pe**2, 1, keepdims=True), 1e-12))
        align = jnp.mean(jnp.sum((un - pn) ** 2, axis=1))

        def uniformity(x):
            d2 = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1)
            n = x.shape[0]
            mask = ~jnp.eye(n, dtype=bool)
            return jnp.log(jnp.sum(jnp.exp(-2.0 * d2) * mask) / jnp.maximum(n * (n - 1), 1))

        unif = (uniformity(un[:256]) + uniformity(pn[:256])) / 2.0
        loss = align + gamma * unif
        return loss, {"rec_loss": align, "cl_loss": unif}

    def encode_eval(params, extras):
        return module.apply(params)

    return ModelBundle(
        name="DirectAU", cfg=cfg, cf=cf, kg=None, uses_kg=False,
        init=init, batch_loss=batch_loss, encode_eval=encode_eval,
    )


# ---------------------------------------------------------------- SimGCL
def _build_simgcl_like(name: str, single_pass: bool):
    def builder(cfg: Config, cf: CFDeviceData, kg=None) -> ModelBundle:
        module = _Tables(cf.n_users, cf.n_items, cfg.embedding_size)
        eps = 0.1

        def init(rng):
            return module.init(rng), ()

        def batch_loss(params, extras, batch, rng):
            users, pos, neg = batch
            u, i = module.apply(params)
            clean = _lightgcn_forward(cf, u, i, cfg.n_layers)
            u_emb, i_emb = _mean_split(cf, clean)
            ue, pe, ne = u_emb[users], i_emb[pos], i_emb[neg]
            rec = bpr_loss(ue, pe, ne)
            reg = l2_reg_loss(cfg.reg, ue, pe, ne) / cfg.batch_size
            uu, um = unique_mask(users)
            iu, im = unique_mask(pos)
            if single_pass:
                # XSimGCL: one noisy pass; contrast final vs layer-1
                noisy = _lightgcn_forward(cf, u, i, cfg.n_layers, rng, eps)
                fu, fi = _mean_split(cf, noisy)
                lu = noisy[1][: cf.n_users]
                li = noisy[1][cf.n_users :]
                cl = info_nce_masked(fu[uu], lu[uu], um, cfg.temp)
                cl = cl + info_nce_masked(fi[iu], li[iu], im, cfg.temp)
            else:
                k1, k2 = jax.random.split(rng)
                v1 = _lightgcn_forward(cf, u, i, cfg.n_layers, k1, eps)
                v2 = _lightgcn_forward(cf, u, i, cfg.n_layers, k2, eps)
                u1, i1 = _mean_split(cf, v1, skip_first=True)
                u2, i2 = _mean_split(cf, v2, skip_first=True)
                cl = info_nce_masked(u1[uu], u2[uu], um, cfg.temp)
                cl = cl + info_nce_masked(i1[iu], i2[iu], im, cfg.temp)
            cl = cfg.cl_rate * cl
            return rec + reg + cl, {"rec_loss": rec, "cl_loss": cl}

        def encode_eval(params, extras):
            u, i = module.apply(params)
            return _mean_split(cf, _lightgcn_forward(cf, u, i, cfg.n_layers))

        return ModelBundle(
            name=name, cfg=cfg, cf=cf, kg=None, uses_kg=False,
            init=init, batch_loss=batch_loss, encode_eval=encode_eval,
        )

    return builder


register_model("SimGCL")(_build_simgcl_like("SimGCL", single_pass=False))
register_model("XSimGCL")(_build_simgcl_like("XSimGCL", single_pass=True))


# ---------------------------------------------------------------- NCL
N_CLUSTERS = 32
KMEANS_ITERS = 5


@register_model("NCL")
def build_ncl(cfg: Config, cf: CFDeviceData, kg=None) -> ModelBundle:
    module = _Tables(cf.n_users, cf.n_items, cfg.embedding_size)
    proto_reg = 1e-7
    ssl_reg = cfg.cl_rate

    def init(rng):
        params = module.init(rng)
        extras = {
            "user_centroids": jnp.zeros((N_CLUSTERS, cfg.embedding_size)),
            "item_centroids": jnp.zeros((N_CLUSTERS, cfg.embedding_size)),
        }
        return params, extras

    def _kmeans(rng, x):
        """Lloyd's iterations on device (replaces upstream faiss)."""
        idx = jax.random.choice(rng, x.shape[0], (N_CLUSTERS,), replace=False)
        cent = x[idx]
        for _ in range(KMEANS_ITERS):
            d = jnp.sum((x[:, None] - cent[None]) ** 2, axis=-1)
            assign = jnp.argmin(d, axis=1)
            one_hot = jax.nn.one_hot(assign, N_CLUSTERS, dtype=x.dtype)
            counts = jnp.maximum(one_hot.sum(0), 1.0)
            cent = (one_hot.T @ x) / counts[:, None]
        return cent

    def epoch_setup(params, extras, rng):
        u, i = module.apply(params)
        k1, k2 = jax.random.split(rng)
        return {
            "user_centroids": _kmeans(k1, u),
            "item_centroids": _kmeans(k2, i),
        }

    def batch_loss(params, extras, batch, rng):
        users, pos, neg = batch
        u, i = module.apply(params)
        outs = _lightgcn_forward(cf, u, i, cfg.n_layers)
        u_emb, i_emb = _mean_split(cf, outs)
        ue, pe, ne = u_emb[users], i_emb[pos], i_emb[neg]
        rec = bpr_loss(ue, pe, ne)
        reg = l2_reg_loss(cfg.reg, ue, pe, ne) / cfg.batch_size
        uu, um = unique_mask(users)
        iu, im = unique_mask(pos)
        # structural: layer-2 (even-hop) vs layer-0 embeddings
        hop = outs[min(2, len(outs) - 1)]
        ego = outs[0]
        ssl = info_nce_masked(hop[: cf.n_users][uu], ego[: cf.n_users][uu], um, cfg.temp)
        ssl = ssl + info_nce_masked(
            hop[cf.n_users :][iu], ego[cf.n_users :][iu], im, cfg.temp
        )
        ssl = ssl_reg * ssl
        # prototype: embeddings vs their nearest centroid
        def proto(x, cent, nodes, valid):
            xn = x[nodes]
            d = jnp.sum((xn[:, None] - cent[None]) ** 2, axis=-1)
            assign = jnp.argmin(d, axis=1)
            return info_nce_masked(xn, cent[assign], valid, cfg.temp)

        pl = proto(u, extras["user_centroids"], uu, um) + proto(
            i, extras["item_centroids"], iu, im
        )
        pl = proto_reg * pl
        loss = rec + reg + ssl + pl
        return loss, {"rec_loss": rec, "cl_loss": ssl, "proto_loss": pl}

    def encode_eval(params, extras):
        u, i = module.apply(params)
        return _mean_split(cf, _lightgcn_forward(cf, u, i, cfg.n_layers))

    return ModelBundle(
        name="NCL", cfg=cfg, cf=cf, kg=None, uses_kg=False,
        init=init, batch_loss=batch_loss, encode_eval=encode_eval,
        epoch_setup=epoch_setup,
    )


# ---------------------------------------------------------------- MixGCF
N_CAND_NEGS = 8


@register_model("MixGCF")
def build_mixgcf(cfg: Config, cf: CFDeviceData, kg=None) -> ModelBundle:
    module = _Tables(cf.n_users, cf.n_items, cfg.embedding_size)

    def init(rng):
        return module.init(rng), ()

    def batch_loss(params, extras, batch, rng):
        users, pos, neg = batch
        u, i = module.apply(params)
        outs = _lightgcn_forward(cf, u, i, cfg.n_layers)
        u_emb, i_emb = _mean_split(cf, outs)
        ue, pe = u_emb[users], i_emb[pos]
        # hop-mixing: M candidate negatives, positive-mixed per hop,
        # hardest (highest inner product) picked
        k1, k2 = jax.random.split(rng)
        cands = jax.random.randint(k1, (users.shape[0], N_CAND_NEGS), 0, cf.n_items)
        alpha = jax.random.uniform(k2, (users.shape[0], N_CAND_NEGS, 1))
        mixed = alpha * i_emb[cands] + (1 - alpha) * pe[:, None, :]
        scores = jnp.einsum("bd,bmd->bm", ue, mixed)
        hardest = jnp.argmax(scores, axis=1)
        ne = jnp.take_along_axis(mixed, hardest[:, None, None], axis=1)[:, 0]
        rec = bpr_loss(ue, pe, ne)
        reg = l2_reg_loss(cfg.reg, ue, pe, ne) / cfg.batch_size
        return rec + reg, {"rec_loss": rec, "reg_loss": reg}

    def encode_eval(params, extras):
        u, i = module.apply(params)
        return _mean_split(cf, _lightgcn_forward(cf, u, i, cfg.n_layers))

    return ModelBundle(
        name="MixGCF", cfg=cfg, cf=cf, kg=None, uses_kg=False,
        init=init, batch_loss=batch_loss, encode_eval=encode_eval,
    )


# ---------------------------------------------------------------- SSL4Rec
@register_model("SSL4Rec")
def build_ssl4rec(cfg: Config, cf: CFDeviceData, kg=None) -> ModelBundle:
    class Towers(nn.Module):
        @nn.compact
        def __call__(self, drop_rng=None, drop_rate=0.0):
            u = self.param("user_emb", nn.initializers.xavier_uniform(), (cf.n_users, cfg.embedding_size))
            i = self.param("item_emb", nn.initializers.xavier_uniform(), (cf.n_items, cfg.embedding_size))
            u = nn.Dense(cfg.embedding_size, name="user_tower")(u)
            it = i
            if drop_rng is not None:
                keep = jax.random.bernoulli(drop_rng, 1.0 - drop_rate, i.shape)
                it = jnp.where(keep, i, 0.0) / (1.0 - drop_rate)
            it = nn.Dense(cfg.embedding_size, name="item_tower")(it)
            return u, it

    module = Towers()

    def init(rng):
        return module.init(rng), ()

    def batch_loss(params, extras, batch, rng):
        users, pos, neg = batch
        k1, k2 = jax.random.split(rng)
        u_emb, i_emb = module.apply(params)
        from ..ops.losses import batch_softmax_loss

        rec = batch_softmax_loss(u_emb[users], i_emb[pos], cfg.temp)
        # item-side feature-dropout contrastive (two corrupted towers)
        _, i1 = module.apply(params, k1, cfg.drop_rate)
        _, i2 = module.apply(params, k2, cfg.drop_rate)
        iu, im = unique_mask(pos)
        cl = cfg.cl_rate * info_nce_masked(i1[iu], i2[iu], im, cfg.temp)
        reg = l2_reg_loss(cfg.reg, u_emb[users], i_emb[pos]) / cfg.batch_size
        return rec + cl + reg, {"rec_loss": rec, "cl_loss": cl}

    def encode_eval(params, extras):
        return module.apply(params)

    return ModelBundle(
        name="SSL4Rec", cfg=cfg, cf=cf, kg=None, uses_kg=False,
        init=init, batch_loss=batch_loss, encode_eval=encode_eval,
    )


# ---------------------------------------------------------------- BUIR
@register_model("BUIR")
def build_buir(cfg: Config, cf: CFDeviceData, kg=None) -> ModelBundle:
    """BUIR-ID (bootstrapping user/item representations, negatives-free):
    online encoder + slowly-moving EMA target encoder; the online
    predictor regresses each side's target projection (both directions),
    loss = 2 - 2 * cos. Target tables live in extras and are EMA-updated
    every step. Registered in the reference's SSL list (main.py:102)
    without a committed file."""
    momentum = 0.995

    class Online(nn.Module):
        @nn.compact
        def __call__(self):
            u = self.param("user_emb", nn.initializers.xavier_uniform(), (cf.n_users, cfg.embedding_size))
            i = self.param("item_emb", nn.initializers.xavier_uniform(), (cf.n_items, cfg.embedding_size))
            pred = nn.Dense(cfg.embedding_size, name="predictor")
            return u, i, pred(u), pred(i)

    module = Online()

    def init(rng):
        params = module.init(rng)
        # copies, not references: params and extras both thread through
        # DONATED dispatch — sharing one buffer between them is a
        # double-donation error (f(donate(a), donate(a)))
        u0 = jnp.copy(params["params"]["user_emb"])
        i0 = jnp.copy(params["params"]["item_emb"])
        return params, {"target_u": u0, "target_i": i0}

    def update_extras(params, extras, batch, rng):
        pu = params["params"]["user_emb"]
        pi = params["params"]["item_emb"]
        return {
            "target_u": momentum * extras["target_u"] + (1 - momentum) * pu,
            "target_i": momentum * extras["target_i"] + (1 - momentum) * pi,
        }

    def _cos_reg(pred, target):
        p = pred * jax.lax.rsqrt(jnp.maximum(jnp.sum(pred**2, -1, keepdims=True), 1e-12))
        t = target * jax.lax.rsqrt(jnp.maximum(jnp.sum(target**2, -1, keepdims=True), 1e-12))
        return jnp.mean(2.0 - 2.0 * jnp.sum(p * t, axis=-1))

    def batch_loss(params, extras, batch, rng):
        users, pos, neg = batch
        u, i, pu, pi = module.apply(params)
        tu = jax.lax.stop_gradient(extras["target_u"])
        ti = jax.lax.stop_gradient(extras["target_i"])
        loss = _cos_reg(pu[users], ti[pos]) + _cos_reg(pi[pos], tu[users])
        reg = l2_reg_loss(cfg.reg, u[users], i[pos]) / cfg.batch_size
        return loss + reg, {"rec_loss": loss}

    def encode_eval(params, extras):
        u, i, pu, pi = module.apply(params)
        # score by symmetric online/target cross products (BUIR eq. 7):
        # folded into single representations u+pred(u), i+pred(i)
        return u + pu, i + pi

    return ModelBundle(
        name="BUIR", cfg=cfg, cf=cf, kg=None, uses_kg=False,
        init=init, batch_loss=batch_loss, encode_eval=encode_eval,
        update_extras=update_extras,
    )


# ---------------------------------------------------------------- SelfCF
@register_model("SelfCF")
def build_selfcf(cfg: Config, cf: CFDeviceData, kg=None) -> ModelBundle:
    """SelfCF-ed (self-supervised CF via output perturbation): one
    LightGCN encoder, target = edge-dropout-perturbed stop-gradient
    output, predictor regresses the perturbed view (both sides). No
    momentum network (SelfCF's simplification of BUIR)."""

    class Enc(nn.Module):
        @nn.compact
        def __call__(self, keep_rate: float = 1.0, train: bool = False):
            u = self.param("user_emb", nn.initializers.xavier_uniform(), (cf.n_users, cfg.embedding_size))
            i = self.param("item_emb", nn.initializers.xavier_uniform(), (cf.n_items, cfg.embedding_size))
            adj = cf.adj
            if train and keep_rate < 1.0:
                adj = adj.dropped(self.make_rng("edges"), keep_rate)
            ego = jnp.concatenate([u, i], axis=0)
            outs = [ego]
            for _ in range(cfg.n_layers):
                outs.append(_spmm_pair(adj.fwd, adj.bwd, outs[-1]))
            emb = jnp.mean(jnp.stack(outs, 1), 1)
            pred = nn.Dense(cfg.embedding_size, name="predictor")
            return emb[: cf.n_users], emb[cf.n_users :], pred(emb[: cf.n_users]), pred(emb[cf.n_users :])

    module = Enc()

    def init(rng):
        return module.init({"params": rng, "edges": rng}), ()

    def _cos_reg(pred, target):
        p = pred * jax.lax.rsqrt(jnp.maximum(jnp.sum(pred**2, -1, keepdims=True), 1e-12))
        t = target * jax.lax.rsqrt(jnp.maximum(jnp.sum(target**2, -1, keepdims=True), 1e-12))
        return jnp.mean(2.0 - 2.0 * jnp.sum(p * t, axis=-1))

    def batch_loss(params, extras, batch, rng):
        users, pos, neg = batch
        u, i, pu, pi = module.apply(params)
        tu, ti, _, _ = module.apply(
            params, 1.0 - cfg.drop_rate, True, rngs={"edges": rng}
        )
        tu = jax.lax.stop_gradient(tu)
        ti = jax.lax.stop_gradient(ti)
        loss = _cos_reg(pu[users], ti[pos]) + _cos_reg(pi[pos], tu[users])
        reg = l2_reg_loss(cfg.reg, u[users], i[pos]) / cfg.batch_size
        return loss + reg, {"rec_loss": loss}

    def encode_eval(params, extras):
        u, i, pu, pi = module.apply(params)
        return u + pu, i + pi

    return ModelBundle(
        name="SelfCF", cfg=cfg, cf=cf, kg=None, uses_kg=False,
        init=init, batch_loss=batch_loss, encode_eval=encode_eval,
    )
