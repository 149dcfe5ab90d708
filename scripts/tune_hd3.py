"""HD-family default tuning (roadmap: HD models early-peak on the
learnable synthetic). Grid over lrate x reg for HGNN_HD3 on the
mid-size planted-cluster benchmark; prints one JSON line per trial.

Run: timeout 5400 python scripts/tune_hd3.py [model]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main(model="HGNN_HD3"):
    from hypergraph_diffusion_for_recommendation_tpu.core import make_config
    from hypergraph_diffusion_for_recommendation_tpu.data import (
        build_cf_device_data,
        build_interaction,
        synthetic_dataset,
    )
    from hypergraph_diffusion_for_recommendation_tpu.models import build_model
    from hypergraph_diffusion_for_recommendation_tpu.train import Trainer

    train, test, _ = synthetic_dataset(
        n_users=1890, n_items=4000, n_clusters=64, mean_degree=53.0, seed=7
    )
    inter = build_interaction(train, test)
    cf_dev = build_cf_device_data(inter, eval_user_multiple=512)
    print(
        f"# {inter.n_users} users / {inter.n_items} items / {inter.n_cf_train} train",
        file=sys.stderr, flush=True,
    )

    grid = [
        dict(lrate=0.01, reg=0.1),     # current default (control)
        dict(lrate=0.003, reg=0.1),
        dict(lrate=0.001, reg=0.1),
        dict(lrate=0.01, reg=0.01),
        dict(lrate=0.003, reg=0.01),
        dict(lrate=0.001, reg=0.01),
    ]
    for g in grid:
        cfg = make_config(
            model, item_ranking=(20,), eval_user_batch=512, max_epoch=60,
            early_stopping_steps=12, batch_size=2048, **g,
        )
        t0 = time.time()
        res = Trainer(build_model(cfg, cf_dev)).fit(quiet=True)
        out = {
            **g,
            "model": model,
            "best_recall@20": res.best_metrics.get("recall"),
            "best_ndcg@20": res.best_metrics.get("ndcg"),
            "best_epoch": res.best_epoch,
            "epochs_run": len(res.history),
            "sec": round(time.time() - t0, 1),
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:2])
