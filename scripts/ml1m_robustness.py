"""Robustness matrix at ML-1M shape (reference output.csv experiment
style, scaled up from the LastFM-size matrix in BENCH_NOTES).

Runs {full, missing 10%, add_noise 10%} x models on the 6,040-user /
3,706-item / 64-cluster synthetic and prints one JSON line per cell.

Run: timeout 7200 python scripts/ml1m_robustness.py [model ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("models", nargs="*", default=[])
    ap.add_argument("--experiments", default="full,missing,add_noise")
    ap.add_argument("--pct", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--early-stop", type=int, default=6)
    args = ap.parse_args()

    import hypergraph_diffusion_for_recommendation_tpu.data.device as devmod

    devmod.PALLAS_BF16 = True
    from hypergraph_diffusion_for_recommendation_tpu.core import make_config
    from hypergraph_diffusion_for_recommendation_tpu.data import (
        apply_experiment,
        build_cf_device_data,
        build_interaction,
        synthetic_dataset,
    )
    from hypergraph_diffusion_for_recommendation_tpu.models import build_model
    from hypergraph_diffusion_for_recommendation_tpu.train import Trainer

    models = list(args.models) or ["LightGCN", "SGL", "HGNN_HD3"]
    base_train, base_test, _ = synthetic_dataset(
        n_users=6040, n_items=3706, n_clusters=64, mean_degree=147.0, seed=7
    )

    for experiment in args.experiments.split(","):
        kw = {}
        if experiment == "missing":
            kw["missing_pct"] = args.pct
        if experiment == "add_noise":
            kw["noise_pct"] = args.pct
        train, test = apply_experiment(base_train, base_test, experiment, seed=0, **kw)
        inter = build_interaction(train, test)
        cf_dev = build_cf_device_data(inter, eval_user_multiple=512)
        print(
            f"# {experiment}{args.pct if experiment != 'full' else ''}: "
            f"{inter.n_cf_train} train edges",
            file=sys.stderr, flush=True,
        )
        for model in models:
            cfg = make_config(
                model, batch_size=2048, item_ranking=(20,), eval_user_batch=512,
                max_epoch=args.epochs, early_stopping_steps=args.early_stop,
                evaluate_every=1,
            )
            t0 = time.time()
            tr = Trainer(build_model(cfg, cf_dev))
            res = tr.fit(quiet=True)
            print(json.dumps({
                "experiment": experiment,
                "pct": args.pct if experiment != "full" else 0,
                "model": model,
                "best_recall@20": res.best_metrics.get("recall"),
                "best_ndcg@20": res.best_metrics.get("ndcg"),
                "best_epoch": res.best_epoch,
                "total_sec": round(time.time() - t0, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
