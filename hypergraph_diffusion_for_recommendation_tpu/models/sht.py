"""SHT — sparse hypergraph transformer.

Parity with reference model/graph/SHT.py:144-272:
  * GCN backbone: K one-hop props, summed (lats, :195-201);
  * hyperedge transform: hyper = embeds.detach() @ (H^T H) with
    learnable H [hyperedge_num, d] (:192-203);
  * EVAL scores use the HYPER embeddings (predict, :265-267);
  * loss = BPR(base) + BPR(hyper) + reg * Σ||W||² (squared norms,
    calcRegLoss :234-239) + prediction-alignment SSL on randomly
    sampled (user, item) pairs with cross-view detached targets
    (:241-263).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import Config
from ..data.device import CFDeviceData
from ..ops.losses import bpr_loss
from ..ops.sparse import spmm_pair
from .base import ModelBundle, register_model


class SHTModule(nn.Module):
    n_users: int
    n_items: int
    dim: int
    n_layers: int
    n_hyperedges: int

    @nn.compact
    def __call__(self, cf: CFDeviceData):
        u = self.param("user_emb", nn.initializers.xavier_uniform(), (self.n_users, self.dim))
        i = self.param("item_emb", nn.initializers.xavier_uniform(), (self.n_items, self.dim))
        u_hyper = self.param("user_hyper", nn.initializers.xavier_uniform(), (self.n_hyperedges, self.dim))
        i_hyper = self.param("item_hyper", nn.initializers.xavier_uniform(), (self.n_hyperedges, self.dim))
        ego = jnp.concatenate([u, i], axis=0)
        lats = [ego]
        for _ in range(self.n_layers):
            lats.append(spmm_pair(cf.adj.fwd, cf.adj.bwd, lats[-1]))
        embeds = sum(lats)
        base = jax.lax.stop_gradient(embeds)  # detach (:202-204)
        hyper_u = base[: self.n_users] @ (u_hyper.T @ u_hyper)
        hyper_i = base[self.n_users :] @ (i_hyper.T @ i_hyper)
        return embeds, hyper_u, hyper_i


@register_model("SHT")
def build_sht(cfg: Config, cf: CFDeviceData, kg=None) -> ModelBundle:
    module = SHTModule(cf.n_users, cf.n_items, cfg.hyper_dim, cfg.n_layers, cfg.hyperedge_num)
    edge_samp = int(0.1 * cf.adj.fwd.nnz)
    edge_samp += edge_samp % 2  # reference keeps it even (:211-212)
    # Regularisation semantics. The reference's SHT is the ONLY model in
    # its codebase regularising the FULL parameter tables every step
    # (calcRegLoss :234-239) instead of the batch rows its own
    # util/loss_torch.py:17-21 convention uses everywhere else. At the
    # pinned parity config (reg=0.01) that full-table pull exceeds the
    # batch learning signal on some seeds: embedding norms decay to
    # zero, the loss freezes at ln4 (the zero-score BPR value), and the
    # converged recall is a seed lottery in BOTH implementations
    # (results/stopping_rule_ab/RESULTS.md finding 3). The product
    # default "batch" regularises the gathered batch rows (plus the
    # small hyperedge weight tables in full, as weight decay) — the
    # convention of every other model here and in the reference;
    # --sht_reg=full restores the reference's exact semantics.
    # 9-seed A/B: results/sht_reg_ab/RESULTS.md.
    sht_reg = getattr(cfg, "sht_reg", "batch")

    def init(rng):
        return module.init(rng, cf), ()

    def batch_loss(params, extras, batch, rng):
        users, pos, neg = batch
        embeds, hyper_u, hyper_i = module.apply(params, cf)
        u_emb, i_emb = embeds[: cf.n_users], embeds[cf.n_users :]
        rec = bpr_loss(u_emb[users], i_emb[pos], i_emb[neg]) + bpr_loss(
            hyper_u[users], hyper_i[pos], hyper_i[neg]
        )
        if sht_reg == "full":
            # squared-norm reg over all params (calcRegLoss :234-239)
            sq = sum(jnp.sum(jnp.square(p)) for p in jax.tree.leaves(params))
            reg = cfg.reg * sq
        else:
            # batch-row squared reg (both encoder views) + weight decay
            # on the hyperedge tables
            p = params["params"]
            rows = sum(
                jnp.sum(jnp.square(e))
                for e in (u_emb[users], i_emb[pos], i_emb[neg],
                          hyper_u[users], hyper_i[pos], hyper_i[neg])
            )
            w = jnp.sum(jnp.square(p["user_hyper"])) + jnp.sum(
                jnp.square(p["item_hyper"])
            )
            reg = cfg.reg * (rows / users.shape[0] + w)
        # prediction-alignment SSL on random (u, i) pairs (:223-231,246-261).
        # The reference's torch form `log(1 - sigmoid(d) + 1e-8)` is NOT
        # safe under XLA: reassociation computes (1 + 1e-8) - sc, and
        # 1 + 1e-8 == 1.0 in f32, so a saturated sigmoid yields
        # log(0) = -inf (observed once batch-row reg lets scores grow).
        # log_sigmoid(±d) is the same math computed exactly — identical
        # values away from saturation (the 1e-8 matters only there) and
        # finite everywhere.
        ku, ki = jax.random.split(rng)
        pck_u = jax.random.randint(ku, (edge_samp,), 0, cf.n_users)
        pck_i = jax.random.randint(ki, (edge_samp,), 0, cf.n_items)
        s1 = jnp.sum(hyper_u[pck_u] * hyper_i[pck_i], axis=-1)
        s2 = jnp.sum(u_emb[pck_u] * i_emb[pck_i], axis=-1)
        half = edge_samp // 2
        d1 = (s1[:half] - s1[half:]) / cfg.temp
        d2 = (s2[:half] - s2[half:]) / cfg.temp
        t2 = jax.lax.stop_gradient(jax.nn.sigmoid(d2))
        t1 = jax.lax.stop_gradient(jax.nn.sigmoid(d1))
        ssl1 = -jnp.mean(
            t2 * jax.nn.log_sigmoid(d1) + (1 - t2) * jax.nn.log_sigmoid(-d1)
        )
        ssl2 = -jnp.mean(
            t1 * jax.nn.log_sigmoid(d2) + (1 - t1) * jax.nn.log_sigmoid(-d2)
        )
        ssl = cfg.cl_rate * (ssl1 + ssl2)
        return rec + reg + ssl, {"rec_loss": rec, "cl_loss": ssl, "reg_loss": reg}

    def encode_eval(params, extras):
        _, hyper_u, hyper_i = module.apply(params, cf)
        return hyper_u, hyper_i

    return ModelBundle(
        name="SHT", cfg=cfg, cf=cf, kg=None, uses_kg=False,
        init=init, batch_loss=batch_loss, encode_eval=encode_eval,
    )
