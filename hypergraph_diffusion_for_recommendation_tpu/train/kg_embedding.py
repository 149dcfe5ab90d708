"""Standalone knowledge-graph triple-embedding trainer.

The reference ships a KG-embedding CLI (`main_kg_embedding.py`) and the
`Measure` evaluation class (util/evaluation.py:99-156: Hit@1/3/10, MR,
MRR in raw and filtered settings) plus a RealE conf — but the
`KnowledgeGraphEmbedding` class it imports does not exist at HEAD
(survey 3.5). This module rebuilds the capability TPU-natively:

  * models: TransE (margin/logsigmoid), DistMult, and RealE-style
    bilinear with relation-wise diagonal re-scaling;
  * training: on-device corrupted-head/tail batches, jit'd scan epochs;
  * evaluation: full-entity ranking per test triple on device, raw and
    FILTERED ranks (known true triples masked), Measure parity.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp
import optax



@dataclass
class KGEConfig:
    model: str = "TransE"  # TransE | DistMult | RealE
    dim: int = 64
    lrate: float = 0.001
    batch_size: int = 2048
    max_epoch: int = 100
    reg: float = 1e-5
    margin: float = 1.0
    neg_ratio: int = 1
    seed: int = 0
    eval_every: int = 10


@dataclass
class Measure:
    """util/evaluation.py:99-156 parity: accumulated rank statistics."""

    hit1: dict = field(default_factory=lambda: {"raw": 0.0, "fil": 0.0})
    hit3: dict = field(default_factory=lambda: {"raw": 0.0, "fil": 0.0})
    hit10: dict = field(default_factory=lambda: {"raw": 0.0, "fil": 0.0})
    mr: dict = field(default_factory=lambda: {"raw": 0.0, "fil": 0.0})
    mrr: dict = field(default_factory=lambda: {"raw": 0.0, "fil": 0.0})

    def update_batch(self, ranks: np.ndarray, setting: str) -> None:
        self.hit1[setting] += float((ranks == 1).sum())
        self.hit3[setting] += float((ranks <= 3).sum())
        self.hit10[setting] += float((ranks <= 10).sum())
        self.mr[setting] += float(ranks.sum())
        self.mrr[setting] += float((1.0 / ranks).sum())

    def normalize(self, normalizer: float) -> None:
        if normalizer == 0:
            return
        for s in ("raw", "fil"):
            self.hit1[s] /= normalizer
            self.hit3[s] /= normalizer
            self.hit10[s] /= normalizer
            self.mr[s] /= normalizer
            self.mrr[s] /= normalizer


def _score(model: str, h_e, r_e, t_e, r_scale=None):
    """Higher = more plausible."""
    if model == "TransE":
        return -jnp.sum(jnp.abs(h_e + r_e - t_e), axis=-1)
    if model == "DistMult":
        return jnp.sum(h_e * r_e * t_e, axis=-1)
    # RealE-style: bilinear with relation diagonal re-scaling of both
    # arguments (real-valued analogue of the hyper-relational scoring)
    return jnp.sum((h_e * r_scale) * r_e * (t_e * r_scale), axis=-1)


class KGEmbeddingTrainer:
    """Replaces the missing `KnowledgeGraphEmbedding.train_and_eval`."""

    def __init__(self, triples: np.ndarray, n_entities: int, n_relations: int, cfg: KGEConfig):
        self.cfg = cfg
        self.n_entities = n_entities
        self.n_relations = n_relations
        tr = np.asarray(triples, np.int64)
        n = tr.shape[0]
        rng = np.random.default_rng(cfg.seed)
        perm = rng.permutation(n)
        n_test = max(int(n * 0.1), 1)
        self.test = tr[perm[:n_test]]
        self.train = tr[perm[n_test:]]

        # filtered-setting lookup: true tails per (h, r) and heads per (r, t)
        ht = {}
        th = {}
        for h, r, t in tr:
            ht.setdefault((int(h), int(r)), []).append(int(t))
            th.setdefault((int(r), int(t)), []).append(int(h))
        self._ht = ht
        self._th = th

        key = jax.random.PRNGKey(cfg.seed)
        k1, k2, k3 = jax.random.split(key, 3)
        init = jax.nn.initializers.xavier_uniform()
        self.params = {
            "ent": init(k1, (n_entities, cfg.dim)),
            "rel": init(k2, (n_relations, cfg.dim)),
        }
        if cfg.model == "RealE":
            self.params["rel_scale"] = jnp.ones((n_relations, cfg.dim)) + 0.01 * jax.random.normal(
                k3, (n_relations, cfg.dim)
            )
        self.opt = optax.adam(cfg.lrate)
        self.opt_state = self.opt.init(self.params)
        self.rng = jax.random.PRNGKey(cfg.seed + 1)

        self._train_dev = jnp.asarray(self.train.astype(np.int32))
        self._epoch_fn = jax.jit(self._build_epoch_fn())

    def _build_epoch_fn(self):
        cfg = self.cfg
        opt = self.opt
        n = self.train.shape[0]
        n_batches = -(-n // cfg.batch_size)
        total = n_batches * cfg.batch_size
        n_ent = self.n_entities

        def loss_fn(params, h, r, t, nh, nt):
            ent, rel = params["ent"], params["rel"]
            rs = params.get("rel_scale")
            r_e = rel[r]
            r_s = rs[r] if rs is not None else None
            if cfg.model == "TransE":
                pos = _score(cfg.model, ent[h], r_e, ent[t], r_s)
                neg_t = _score(cfg.model, ent[h], r_e, ent[nt], r_s)
                neg_h = _score(cfg.model, ent[nh], r_e, ent[t], r_s)
                loss = jnp.mean(jax.nn.softplus(cfg.margin - pos + neg_t)) + jnp.mean(
                    jax.nn.softplus(cfg.margin - pos + neg_h)
                )
            else:
                # bilinear models: full-entity cross-entropy on both ends
                # (margin objectives let DistMult cheat by norm scaling).
                # RealE: score = <h*s_r, r, t*s_r> -> query folds both
                # relation scalings: q = h * s_r^2 * r.
                if r_s is not None:
                    q_t = ent[h] * r_s * r_e * r_s
                    q_h = ent[t] * r_s * r_e * r_s
                else:
                    q_t = ent[h] * r_e
                    q_h = ent[t] * r_e
                logits_t = q_t @ ent.T
                logits_h = q_h @ ent.T
                loss = jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(logits_t, t)
                ) + jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits_h, h))
            reg = cfg.reg * (jnp.mean(ent[h] ** 2) + jnp.mean(ent[t] ** 2) + jnp.mean(r_e**2))
            return loss + reg

        def epoch_fn(params, opt_state, rng, triples):
            k_perm, k_nh, k_nt = jax.random.split(rng, 3)
            perm = jax.random.permutation(k_perm, n)
            idx = jnp.concatenate([perm, perm[: total - n]])
            h = triples[idx, 0].reshape(n_batches, -1)
            r = triples[idx, 1].reshape(n_batches, -1)
            t = triples[idx, 2].reshape(n_batches, -1)
            nh = jax.random.randint(k_nh, h.shape, 0, n_ent)
            nt = jax.random.randint(k_nt, t.shape, 0, n_ent)

            def step(carry, xs):
                params, opt_state = carry
                bh, br, bt, bnh, bnt = xs
                loss, grads = jax.value_and_grad(loss_fn)(params, bh, br, bt, bnh, bnt)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (h, r, t, nh, nt)
            )
            return params, opt_state, jnp.mean(losses)

        return epoch_fn

    def run_epoch(self) -> float:
        self.rng, k = jax.random.split(self.rng)
        self.params, self.opt_state, loss = self._epoch_fn(
            self.params, self.opt_state, k, self._train_dev
        )
        return float(loss)

    def evaluate(self, max_triples: int = 2000) -> Measure:
        """Entity-ranking evaluation, raw + filtered (Measure parity).

        For each test triple, ranks the true tail against all entities
        (and the true head likewise); filtered setting masks other known
        true completions before ranking.
        """
        cfg = self.cfg
        test = self.test[:max_triples]
        ent = self.params["ent"]
        rel = self.params["rel"]
        rs = self.params.get("rel_scale")

        @jax.jit
        def tail_scores(h, r):
            r_e = rel[r]
            r_s = rs[r] if rs is not None else None
            h_e = ent[h]
            if cfg.model == "TransE":
                return -jnp.sum(jnp.abs((h_e + r_e)[:, None, :] - ent[None]), axis=-1)
            if cfg.model == "DistMult":
                return (h_e * r_e) @ ent.T
            return (h_e * r_s * r_e * r_s) @ ent.T

        @jax.jit
        def head_scores(t, r):
            r_e = rel[r]
            r_s = rs[r] if rs is not None else None
            t_e = ent[t]
            if cfg.model == "TransE":
                return -jnp.sum(jnp.abs((t_e - r_e)[:, None, :] - ent[None]), axis=-1)
            if cfg.model == "DistMult":
                return (t_e * r_e) @ ent.T
            return (t_e * r_s * r_e * r_s) @ ent.T

        measure = Measure()
        bs = 128
        for s in range(0, len(test), bs):
            blk = test[s : s + bs]
            h = jnp.asarray(blk[:, 0].astype(np.int32))
            r = jnp.asarray(blk[:, 1].astype(np.int32))
            t = jnp.asarray(blk[:, 2].astype(np.int32))
            ts = np.asarray(tail_scores(h, r))
            hs = np.asarray(head_scores(t, r))
            t_np = blk[:, 2]
            h_np = blk[:, 0]
            # raw ranks
            raw_t = 1 + (ts > ts[np.arange(len(blk)), t_np][:, None]).sum(1)
            raw_h = 1 + (hs > hs[np.arange(len(blk)), h_np][:, None]).sum(1)
            measure.update_batch(np.concatenate([raw_t, raw_h]), "raw")
            # filtered ranks
            for k, (hh, rr, tt) in enumerate(blk):
                known_t = self._ht.get((int(hh), int(rr)), [])
                known_h = self._th.get((int(rr), int(tt)), [])
                row_t = ts[k].copy()
                row_t[known_t] = -np.inf
                row_h = hs[k].copy()
                row_h[known_h] = -np.inf
                fil_t = 1 + (row_t > ts[k, int(tt)]).sum()
                fil_h = 1 + (row_h > hs[k, int(hh)]).sum()
                measure.update_batch(np.asarray([fil_t, fil_h]), "fil")
        measure.normalize(2 * len(test))
        return measure

    def train_and_eval(self, log_fn=print, quiet: bool = True) -> Measure:
        cfg = self.cfg
        for ep in range(cfg.max_epoch):
            loss = self.run_epoch()
            if not quiet and (ep + 1) % cfg.eval_every == 0:
                log_fn(f"epoch {ep+1}: loss {loss:.4f}")
        m = self.evaluate()
        if not quiet:
            log_fn(
                f"fil: hit@1 {m.hit1['fil']:.4f} hit@3 {m.hit3['fil']:.4f} "
                f"hit@10 {m.hit10['fil']:.4f} MR {m.mr['fil']:.1f} MRR {m.mrr['fil']:.4f}"
            )
        return m
