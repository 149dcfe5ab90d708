"""ML-1M-scale model comparison on the planted-cluster synthetic.

Trains a representative model set at the ML-1M shape (6,040 users /
3,706 items / ~790k train edges, 64 clusters) and prints one JSON line
per model: best Recall@20 / NDCG@20, steady-state epoch time, examples
per second. Chance recall@20 at this shape ~ 20/3706 = 0.0054.

Run: timeout 7200 python scripts/ml1m_compare.py [model ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main(*models):
    import hypergraph_diffusion_for_recommendation_tpu.data.device as devmod

    devmod.PALLAS_BF16 = True
    from hypergraph_diffusion_for_recommendation_tpu.core import make_config
    from hypergraph_diffusion_for_recommendation_tpu.data import (
        build_cf_device_data,
        build_interaction,
        build_kg_device_data,
        build_knowledge,
        synthetic_dataset,
    )
    from hypergraph_diffusion_for_recommendation_tpu.models import build_model
    from hypergraph_diffusion_for_recommendation_tpu.train import Trainer

    models = list(models) or ["LightGCN", "HCCF", "HGNN_HD3", "KHGRec"]
    need_kg = any(m in ("KHGRec", "KGAT", "HGNN", "HD2") for m in models)
    train, test, kg_df = synthetic_dataset(
        n_users=6040, n_items=3706, n_clusters=64, mean_degree=147.0,
        seed=7, with_kg=need_kg,
    )
    inter = build_interaction(train, test)
    cf_dev = build_cf_device_data(inter, eval_user_multiple=512)
    kg_dev = None
    if need_kg:
        kg_dev = build_kg_device_data(build_knowledge(kg_df, inter))
    print(
        f"# {inter.n_users} users / {inter.n_items} items / {inter.n_cf_train} train",
        file=sys.stderr, flush=True,
    )

    for model in models:
        cfg = make_config(
            model, batch_size=2048, item_ranking=(20,), eval_user_batch=512,
            max_epoch=15, early_stopping_steps=6, evaluate_every=1,
        )
        uses_kg = cfg.use_knowledge
        t0 = time.time()
        tr = Trainer(build_model(cfg, cf_dev, kg_dev if uses_kg else None))
        res = tr.fit(quiet=True)
        dt = time.time() - t0
        n_ep = max(len(res.history), 1)
        # steady-state epoch time: median of post-compile epochs
        times = sorted(r.train_time for r in res.history[1:]) or [0.0]
        ep_t = times[len(times) // 2]
        eps = tr.n_batches * cfg.batch_size / ep_t if ep_t else 0.0
        print(json.dumps({
            "model": model,
            "best_recall@20": res.best_metrics.get("recall"),
            "best_ndcg@20": res.best_metrics.get("ndcg"),
            "best_epoch": res.best_epoch,
            "epochs_run": n_ep,
            "epoch_sec": round(ep_t, 2),
            "examples_per_sec": round(eps),
            "total_sec": round(dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
