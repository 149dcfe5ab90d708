"""AutoCF — graph masked autoencoder — and LRMRec (AutoCF + frozen
LLM-derived profile embeddings with reconstruction alignment).

Parity with reference model/graph/AutoCF.py / LRMRec.py:
  * LocalGraph seed scoring: 2-hop mean neighbourhood embedding vs ego
    similarity + Gumbel noise, top seed_num seeds (AutoCF.py:256-281);
  * RandomMaskSubgraphs: remove every edge incident to the
    (mask_depth-1)-hop ball around the seeds, renormalise the kept graph
    (encoder adj); decoder adj = kept edges + random pairs among the
    masked-node pool (+ keep_rate*N random nodes) + self loops
    (AutoCF.py:283-355);
  * GTLayer: per-edge multi-head attention with exp/segment-sum row
    normalisation (AutoCF.py:222-255) — here a segment-softmax over a
    static edge list with a validity mask;
  * losses: rec = -mean(u . pos), l2/batch, denominator-only contrast
    regulariser over unique batch nodes (AutoCF.py:131-139), seed-score
    maximisation every fix_steps (AutoCF.py:85-93);
  * LRMRec adds NodeMask (mask-token replacement of mask_ratio nodes),
    a projection MLP and InfoNCE reconstruction against frozen profile
    embeddings (LRMRec.py:248-262).

TPU redesign (static shapes; survey 7.3): subgraph masking is a boolean
node vector + value masks (the reference filters index lists and
dedups via hashing — dynamic nnz); random decoder pairs are drawn by
uniform proposal + masked-pool acceptance; duplicate decoder edges are
kept (attention double-counts them; effect is a per-edge weight, noted
deviation). Profile embeddings load from `<data_dir>/<dataset>/
{usr,itm}_emb_np.pkl` when present, else a seeded random frozen matrix
stands in so the pipeline runs without the private LLM artefacts.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.config import Config
from ..data.device import CFDeviceData
from ..ops.losses import bpr_loss, l2_reg_loss, unique_mask
from ..core.types import with_new_vals
from ..ops.sparse import renormalize_sym, segment_softmax, spmm
from .base import ModelBundle, register_model

# conf/AutoCF.conf values (the reference reads them from the conf file)
GT_LAYERS = 1
GCN_LAYERS = 2
SSL_REG = 0.5
FIX_STEPS = 10
HEAD_NUM = 4
SEED_NUM = 100
MASK_DEPTH = 2
KEEP_RATE = 0.2
# conf/LRMRec.conf extras
MASK_RATIO = 0.1
RECON_WEIGHT = 0.01
RE_TEMPERATURE = 0.2


class GTLayer(nn.Module):
    """Edge-list graph-transformer attention (AutoCF.py:222-255)."""

    head_num: int
    dim: int

    @nn.compact
    def __call__(self, embeds, rows, cols, valid):
        n = embeds.shape[0]
        hd = self.dim // self.head_num
        q_w = self.param("qTrans", nn.initializers.xavier_uniform(), (self.dim, self.dim))
        k_w = self.param("kTrans", nn.initializers.xavier_uniform(), (self.dim, self.dim))
        v_w = self.param("vTrans", nn.initializers.xavier_uniform(), (self.dim, self.dim))
        safe_rows = jnp.clip(rows, 0, n - 1)
        safe_cols = jnp.clip(cols, 0, n - 1)
        q = (embeds[safe_rows] @ q_w).reshape(-1, self.head_num, hd)
        k = (embeds[safe_cols] @ k_w).reshape(-1, self.head_num, hd)
        v = (embeds[safe_cols] @ v_w).reshape(-1, self.head_num, hd)
        att = jnp.clip(jnp.sum(q * k, axis=-1), -10.0, 10.0)  # [E, H]
        att = segment_softmax(att, safe_rows, n, valid[:, None] & jnp.ones_like(att, bool))
        res = (att[:, :, None] * v).reshape(-1, self.dim)
        res = res * valid[:, None].astype(res.dtype)
        return jax.ops.segment_sum(res, safe_rows, num_segments=n)


def _local_graph_scores(rng, all_one, ego):
    """LocalGraph seed sampling (AutoCF.py:256-281)."""
    order = spmm(all_one, jnp.ones((all_one.ncols, 1), ego.dtype))
    fst = spmm(all_one, ego) - ego
    fst_num = order
    scd = (spmm(all_one, fst) - fst) - order * ego
    scd_num = (spmm(all_one, fst_num) - fst_num) - order
    sub = (fst + scd) / (fst_num + scd_num + 1e-8)
    sub = sub / jnp.maximum(jnp.linalg.norm(sub, axis=1, keepdims=True), 1e-12)
    e = ego / jnp.maximum(jnp.linalg.norm(ego, axis=1, keepdims=True), 1e-12)
    scores = jax.nn.sigmoid(jnp.sum(sub * e, axis=-1))
    noise = jnp.clip(jax.random.uniform(rng, scores.shape), 1e-8, 1.0)
    noisy = jnp.log(scores) - jnp.log(-jnp.log(noise))
    _, seeds = jax.lax.top_k(noisy, SEED_NUM)
    return noisy, seeds


def _mask_subgraphs(rng, cf: CFDeviceData, seeds):
    """Static-shape RandomMaskSubgraphs (AutoCF.py:283-355)."""
    n = cf.n_users + cf.n_items
    raw = cf.raw_adj.fwd
    # (mask_depth-1)-hop ball around seeds
    m = jnp.zeros((n,), bool).at[seeds].set(True)
    ball = m
    for _ in range(MASK_DEPTH - 1):
        nb = spmm(cf.raw_adj.fwd, ball.astype(jnp.float32)[:, None])[:, 0] > 0
        ball = ball | nb
    rows = jnp.clip(raw.rows, 0, n - 1)
    cols = jnp.clip(raw.cols, 0, n - 1)
    removed = ball[rows] | ball[cols]
    kept_vals = jnp.where(removed, 0.0, raw.vals)
    enc = renormalize_sym(with_new_vals(raw, kept_vals))

    # masked-node pool = ball + keep_rate * N random nodes
    k1, k2, k3 = jax.random.split(rng, 3)
    samp = jax.random.randint(k1, (int(n * KEEP_RATE),), 0, n)
    pool = ball.at[samp].set(True)
    # random decoder pairs: uniform proposal, accepted if in pool,
    # fallback to the first seed (static stand-in for sampling from the
    # dynamic maskNodes list)
    nnz = raw.vals.shape[0]
    cand_r = jax.random.randint(k2, (nnz,), 0, n)
    cand_c = jax.random.randint(k3, (nnz,), 0, n)
    fb = seeds[0]
    tem_rows = jnp.where(pool[cand_r], cand_r, fb)
    tem_cols = jnp.where(pool[cand_c], cand_c, fb)

    self_loop = jnp.arange(n, dtype=jnp.int32)
    dec_rows = jnp.concatenate([tem_rows, tem_cols, self_loop, rows])
    dec_cols = jnp.concatenate([tem_cols, tem_rows, self_loop, cols])
    orig_valid = (raw.rows < n) & ~removed
    dec_valid = jnp.concatenate(
        [jnp.ones(2 * nnz + n, bool), orig_valid]
    )
    return enc, (dec_rows, dec_cols, dec_valid)


class AutoCFModule(nn.Module):
    n_users: int
    n_items: int
    dim: int
    use_profiles: bool = False
    profile_dim: int = 0

    def setup(self):
        self.user_emb = self.param(
            "user_emb", nn.initializers.xavier_uniform(), (self.n_users, self.dim)
        )
        self.item_emb = self.param(
            "item_emb", nn.initializers.xavier_uniform(), (self.n_items, self.dim)
        )
        self.gt_layers = [GTLayer(HEAD_NUM, self.dim) for _ in range(GT_LAYERS)]
        if self.use_profiles:
            self.mask_token = self.param(
                "mask_token", nn.initializers.xavier_uniform(), (1, self.dim)
            )
            mid = (self.profile_dim + self.dim) // 2
            self.recon_mlp = nn.Sequential(
                [nn.Dense(mid), lambda x: jax.nn.leaky_relu(x, 0.01), nn.Dense(self.profile_dim)]
            )

    def ego(self):
        return jnp.concatenate([self.user_emb, self.item_emb], axis=0)

    def __call__(self, enc_adj, dec=None, ego_override=None):
        embeds = self.ego() if ego_override is None else ego_override
        outs = [embeds]
        for _ in range(GCN_LAYERS):
            outs.append(spmm(enc_adj, outs[-1]))
        if dec is not None:
            rows, cols, valid = dec
            for gt in self.gt_layers:
                outs.append(gt(outs[-1], rows, cols, valid))
        total = sum(outs)
        return total[: self.n_users], total[self.n_users :]

    def masked_ego(self, rng, mask_ratio: float):
        """LRMRec NodeMask: replace ratio*N node embeddings with the
        learned mask token; returns (masked ego, seed ids)."""
        embeds = self.ego()
        n = embeds.shape[0]
        n_seeds = int(n * mask_ratio)
        seeds = jax.random.choice(rng, n, (n_seeds,), replace=False)
        masked = embeds.at[seeds].set(jnp.broadcast_to(self.mask_token, (n_seeds, embeds.shape[1])))
        return masked, seeds

    def init_all(self, enc_adj, dec, rng_mask, profiles):
        """Touch every path so init creates all params."""
        if self.use_profiles:
            mego, seeds = self.masked_ego(rng_mask, MASK_RATIO)
            u, i = self(enc_adj, dec, mego)
            self.reconstruct(jnp.concatenate([u, i], axis=0), seeds, profiles, RE_TEMPERATURE)
        else:
            self(enc_adj, dec)

    def reconstruct(self, embeds, seeds, profiles, temp: float):
        enc = self.recon_mlp(embeds[seeds])
        prf = profiles[seeds]
        x = enc / jnp.maximum(jnp.linalg.norm(enc, axis=1, keepdims=True), 1e-12)
        y = prf / jnp.maximum(jnp.linalg.norm(prf, axis=1, keepdims=True), 1e-12)
        mole = jnp.exp(jnp.sum(x * y, axis=1) / temp)
        deno = jnp.sum(jnp.exp(x @ y.T / temp), axis=1)
        return -jnp.mean(jnp.log(mole / (deno + 1e-8) + 1e-8))


def _contrast_reg(nodes_sorted, valid, all_embeds, all_embeds2=None):
    """AutoCF denominator-only contrast (AutoCF.py:131-139)."""
    if all_embeds2 is None:
        pck = all_embeds[nodes_sorted]
        scores = jnp.log(jnp.sum(jnp.exp(pck @ all_embeds.T), axis=-1))
        vf = valid.astype(scores.dtype)
        return jnp.sum(scores * vf) / jnp.maximum(jnp.sum(vf), 1.0)
    pck = all_embeds[nodes_sorted]
    return jnp.mean(jnp.log(jnp.sum(jnp.exp(pck @ all_embeds2.T), axis=-1)))


def _load_profiles(cfg: Config, n_users: int, n_items: int):
    base = os.path.join(cfg.data_dir, cfg.dataset)
    up = os.path.join(base, "usr_emb_np.pkl")
    ip = os.path.join(base, "itm_emb_np.pkl")
    if os.path.exists(up) and os.path.exists(ip):
        with open(up, "rb") as f:
            usr = np.asarray(pickle.load(f), np.float32)
        with open(ip, "rb") as f:
            itm = np.asarray(pickle.load(f), np.float32)
    else:
        rng = np.random.default_rng(0)
        usr = rng.standard_normal((n_users, 64)).astype(np.float32)
        itm = rng.standard_normal((n_items, 64)).astype(np.float32)
    return jnp.concatenate([jnp.asarray(usr), jnp.asarray(itm)], axis=0)


def _build_autocf_like(name: str, use_profiles: bool):
    def builder(cfg: Config, cf: CFDeviceData, kg=None) -> ModelBundle:
        profiles = _load_profiles(cfg, cf.n_users, cf.n_items) if use_profiles else None
        module = AutoCFModule(
            cf.n_users, cf.n_items, cfg.embedding_size,
            use_profiles, 0 if profiles is None else profiles.shape[1],
        )
        n = cf.n_users + cf.n_items
        nnz = cf.raw_adj.fwd.vals.shape[0]

        def init(rng):
            enc0 = cf.adj.fwd
            dec0 = (
                jnp.zeros((2 * nnz + n + nnz,), jnp.int32),
                jnp.zeros((2 * nnz + n + nnz,), jnp.int32),
                jnp.zeros((2 * nnz + n + nnz,), bool),
            )
            params = module.init(
                {"params": rng}, enc0, dec0, rng, profiles, method=AutoCFModule.init_all
            )
            extras = {
                # copy: extras are DONATED each dispatch; seeding with the
                # bundle-held adjacency buffer would delete cf.adj.fwd.vals
                # for every later trace/eval (the ADVICE r2 aliasing bug)
                "enc_vals": jnp.copy(cf.adj.fwd.vals),
                "dec_rows": dec0[0],
                "dec_cols": dec0[1],
                "dec_valid": dec0[2],
                "samp_score": jnp.float32(0.0),
                "step": jnp.int32(0),
            }
            return params, extras

        def update_extras(params, extras, batch, rng):
            """Resample the masked subgraphs every FIX_STEPS batches
            (AutoCF.py:71-73)."""

            def refresh(_):
                k1, k2 = jax.random.split(rng)
                ego = module.apply(params, method=AutoCFModule.ego)
                scores, seeds = _local_graph_scores(k1, cf.raw_adj.fwd, ego)
                enc, dec = _mask_subgraphs(k2, cf, seeds)
                return {
                    "enc_vals": enc.vals,
                    "dec_rows": dec[0],
                    "dec_cols": dec[1],
                    "dec_valid": dec[2],
                    "samp_score": jnp.mean(scores),
                    "step": extras["step"] + 1,
                }

            def keep(_):
                out = dict(extras)
                out["step"] = extras["step"] + 1
                return out

            return jax.lax.cond(extras["step"] % FIX_STEPS == 0, refresh, keep, None)

        def batch_loss(params, extras, batch, rng):
            users, pos, neg = batch
            enc_adj = with_new_vals(cf.adj.fwd, extras["enc_vals"])
            dec = (extras["dec_rows"], extras["dec_cols"], extras["dec_valid"])
            recon = 0.0
            if use_profiles:
                k_mask, rng = jax.random.split(rng)
                mego, seeds = module.apply(
                    params, k_mask, MASK_RATIO, method=AutoCFModule.masked_ego
                )
                u_emb, i_emb = module.apply(params, enc_adj, dec, mego)
                recon = RECON_WEIGHT * module.apply(
                    params,
                    jnp.concatenate([u_emb, i_emb], axis=0),
                    seeds,
                    profiles,
                    RE_TEMPERATURE,
                    method=AutoCFModule.reconstruct,
                )
            else:
                u_emb, i_emb = module.apply(params, enc_adj, dec)
            ue, pe, ne = u_emb[users], i_emb[pos], i_emb[neg]
            rec = -jnp.mean(jnp.sum(ue * pe, axis=-1))
            reg = l2_reg_loss(cfg.reg, ue, pe, ne) / cfg.batch_size
            uu, um = unique_mask(users)
            iu, im = unique_mask(pos)
            cl = (
                _contrast_reg(uu, um, u_emb) + _contrast_reg(iu, im, i_emb)
            ) * SSL_REG + _contrast_reg(users, None, u_emb, i_emb)
            # seed-score term folded in at refresh steps (AutoCF.py:89-91)
            lg = jnp.where(
                (extras["step"] - 1) % FIX_STEPS == 0, -extras["samp_score"], 0.0
            )
            loss = rec + reg + cl + lg + recon
            aux = {"rec_loss": rec, "cl_loss": cl, "reg_loss": reg}
            if use_profiles:
                aux["recon_loss"] = recon
            return loss, aux

        def encode_eval(params, extras):
            # eval uses the clean normalised adjacency on both passes
            # (AutoCF.py:116-121)
            return module.apply(params, cf.adj.fwd)

        return ModelBundle(
            name=name, cfg=cfg, cf=cf, kg=None, uses_kg=False,
            init=init, batch_loss=batch_loss, encode_eval=encode_eval,
            update_extras=update_extras,
            # AutoCF.py / LRMRec.py import ReduceLROnPlateau but never
            # instantiate it — fixed-lr Adam in the reference
            lr_plateau=False,
        )

    return builder


register_model("AutoCF")(_build_autocf_like("AutoCF", use_profiles=False))
register_model("LRMRec")(_build_autocf_like("LRMRec", use_profiles=True))
