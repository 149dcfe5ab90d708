"""Reference-style facade: the `Recommender.execute()` lifecycle
(base/recommender.py:80-114) on top of the jit'd Trainer.

Gives reference users the familiar surface:

    rec = Recommender(conf_or_cfg)          # or Recommender.from_conf(path)
    rec.execute()                           # build -> train -> test -> evaluate
    scores = rec.predict(raw_user_id)       # full-catalog scores
    top = rec.recommend(raw_user_id, k=20)  # [(raw_item_id, score)]
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax.numpy as jnp


class Recommender:
    def __init__(self, cfg, social=None):
        self.cfg = cfg
        self.social = social
        self._built = False

    @classmethod
    def from_conf(cls, conf_path: str, **overrides) -> "Recommender":
        from ..utils.conf import config_from_conf

        return cls(config_from_conf(conf_path, **overrides))

    # -- lifecycle ------------------------------------------------------
    def build(self) -> None:
        from ..cli import load_dataset
        from ..data import (
            build_cf_device_data,
            build_interaction,
            build_kg_device_data,
            build_knowledge,
        )
        from ..models import build_model, model_data_needs
        from .trainer import Trainer

        cfg = self.cfg
        train, test, kg_df = load_dataset(cfg)
        self.inter = build_interaction(train, test)
        self.cf_dev = build_cf_device_data(
            self.inter, eval_user_multiple=cfg.eval_user_batch,
            needs=model_data_needs(cfg.model),
        )
        kg_dev = None
        if cfg.use_knowledge and kg_df is not None:
            kg_dev = build_kg_device_data(build_knowledge(kg_df, self.inter))
        self.bundle = build_model(cfg, self.cf_dev, kg_dev, social=self.social)
        self.trainer = Trainer(self.bundle)
        self._built = True

    def train(self, quiet: bool = True):
        if not self._built:
            self.build()
        self.result = self.trainer.fit(quiet=quiet)
        self.user_emb, self.item_emb = self.bundle.encode_eval(
            self.trainer.params, self.trainer.extras
        )
        return self.result

    def test(self) -> dict:
        """Final metrics at every configured top-N (reference `test()` +
        `evaluate()` combined, returning structured values instead of
        formatted strings — survey 7.4)."""
        return self.trainer.evaluate()

    def execute(self, quiet: bool = True) -> dict:
        """build -> train -> test (base/recommender.py:80-114)."""
        self.train(quiet=quiet)
        return self.test()

    # -- serving --------------------------------------------------------
    def predict(self, raw_user_id) -> np.ndarray:
        """Full-catalog scores for one user (reference `predict(u)`,
        e.g. KHGRec.py:222-225)."""
        uid = self.inter.user[int(raw_user_id)]
        scores = jnp.dot(self.user_emb[uid], self.item_emb.T, precision="highest")
        return np.asarray(scores)

    def recommend(self, raw_user_id, k: int = 20, exclude_rated: bool = True):
        """Top-k (raw_item_id, score) pairs."""
        uid = self.inter.user[int(raw_user_id)]
        scores = np.array(
            jnp.dot(self.user_emb[uid], self.item_emb.T, precision="highest")
        )
        if exclude_rated:
            rated = np.asarray(self.cf_dev.rated_pad[uid])
            scores[rated[rated >= 0]] = -1e9
        order = np.argsort(-scores)[:k]
        return [(int(self.inter.id2item[i]), float(scores[i])) for i in order]

    def export_embeddings(self, path: Optional[str] = None) -> str:
        """Persist the trained tables for standalone retrieval
        (eval/serving.Retriever, serving_cli)."""
        from ..eval.serving import export_embeddings
        from ..utils.logging import run_dir

        cfg = self.cfg
        path = path or os.path.join(run_dir(cfg), "embeddings.npz")
        return export_embeddings(
            path, self.user_emb, self.item_emb,
            self.inter.id2user, self.inter.id2item,
            rated_pad=self.cf_dev.rated_pad,
            meta={"model": cfg.model, "dataset": cfg.dataset},
        )

    def dump_recommendations(self, path: Optional[str] = None, k: Optional[int] = None) -> str:
        """`<Model>-top-N items.txt` artefact (base/graph_recommender.py:94-118)."""
        from ..ops.topk import masked_topk
        from ..utils.logging import dump_recommendations, run_dir

        cfg = self.cfg
        k = k or cfg.max_n
        path = path or os.path.join(run_dir(cfg), f"{cfg.model}-top-{k}items.txt")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        ed = self.cf_dev.eval_data
        users = ed.test_users[: ed.n_test_users]
        scores = jnp.dot(self.user_emb[users], self.item_emb.T, precision="highest")
        vals, ids = masked_topk(scores, self.cf_dev.rated_pad[users], k)
        ids_np = np.asarray(ids)
        test_pos = np.asarray(ed.test_pos_pad[: ed.n_test_users])
        hits = (ids_np[:, :, None] == test_pos[:, None, :]).any(-1)
        raw_users = [int(self.inter.id2user[u]) for u in np.asarray(users)]
        dump_recommendations(
            path, raw_users, self.inter.id2item, ids_np, np.asarray(vals), hits
        )
        return path
