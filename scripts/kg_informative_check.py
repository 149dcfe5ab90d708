"""KG-informative (cold-item) regime: can KG-aware models beat CF-only?

Generates the planted-cluster synthetic with `cold_item_frac` of the
catalog damped ~20x in train (>=1 edge each, so still scoreable) while
the test set gains cluster-matched interactions for those items; the
cold items' cluster identity then survives mainly in the KG
attributes. Reports overall AND cold-item-only Recall@20 per model.

The cold-only evaluation reuses the trained parameters with a second
device bundle whose test set is filtered to cold-item pairs — the
dense id maps agree because both Interactions share the identical
train stream and every user/cold item appears in train.

Run: timeout 7200 python scripts/kg_informative_check.py [model ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main(*models):
    from hypergraph_diffusion_for_recommendation_tpu.core import make_config
    from hypergraph_diffusion_for_recommendation_tpu.data import (
        build_cf_device_data,
        build_interaction,
        build_kg_device_data,
        build_knowledge,
        synthetic_dataset,
    )
    from hypergraph_diffusion_for_recommendation_tpu.data.synthetic import _item_clusters
    from hypergraph_diffusion_for_recommendation_tpu.models import build_model
    from hypergraph_diffusion_for_recommendation_tpu.train import Trainer

    models = list(models) or ["LightGCN", "HGNN_HD3", "KGAT", "KHGRec"]
    n_items, n_clusters, seed = 4000, 64, 7
    train, test, kg_df = synthetic_dataset(
        n_users=1890, n_items=n_items, n_clusters=n_clusters, mean_degree=53.0,
        seed=seed, with_kg=True, cold_item_frac=0.15,
    )
    rng_cold = np.random.default_rng(seed + 9000)
    cold_items = set(
        rng_cold.choice(n_items, max(int(n_items * 0.15), 1), replace=False).tolist()
    )
    cold_mask = np.asarray([it in cold_items for it in test[:, 1]])
    test_cold = test[cold_mask]
    print(
        f"# {len(train)} train / {len(test)} test ({cold_mask.sum()} cold-item pairs, "
        f"{len(cold_items)} cold items)",
        file=sys.stderr, flush=True,
    )

    inter = build_interaction(train, test)
    cf_dev = build_cf_device_data(inter, eval_user_multiple=512)
    inter_cold = build_interaction(train, test_cold)
    cf_dev_cold = build_cf_device_data(inter_cold, eval_user_multiple=512)
    kg = build_knowledge(kg_df, inter)
    kg_dev = build_kg_device_data(kg)
    kg_cold = build_knowledge(kg_df, inter_cold)
    kg_dev_cold = build_kg_device_data(kg_cold)

    for model in models:
        cfg = make_config(
            model, batch_size=2048, item_ranking=(20,), eval_user_batch=512,
            max_epoch=40, early_stopping_steps=10, evaluate_every=1,
        )
        uses_kg = cfg.use_knowledge
        t0 = time.time()
        tr = Trainer(build_model(cfg, cf_dev, kg_dev if uses_kg else None))
        res = tr.fit(quiet=True)
        # cold-only eval with the SAME trained parameters
        tr_cold = Trainer(
            build_model(cfg, cf_dev_cold, kg_dev_cold if uses_kg else None)
        )
        tr_cold.params = tr.params
        tr_cold.extras = tr.extras
        m_cold = tr_cold.evaluate()
        print(json.dumps({
            "model": model,
            "overall_recall@20": res.best_metrics.get("recall"),
            "cold_recall@20": m_cold[20]["recall"],
            "cold_ndcg@20": m_cold[20]["ndcg"],
            "best_epoch": res.best_epoch,
            "sec": round(time.time() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
