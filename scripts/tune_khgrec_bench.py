"""Close the bench quality gap (VERDICT r2 #2): sweep the flagship's
hyperparameters on the EXACT bench task and report converged Recall@20
against the empirical Bayes-oracle ceiling (data/synthetic.py
oracle_metrics — pop x affinity generative weights, train-rated masked).

Each trial is a fresh Trainer (fresh remote compile — budget several
minutes/trial through the axon tunnel); results append to
parity/khgrec_tune.jsonl so a killed sweep loses at most one trial.

  python scripts/tune_khgrec_bench.py [--trials all|quick] [--max_epoch 400]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

OUT = os.path.join(ROOT, "parity", "khgrec_tune.jsonl")

# Shape-preserving knobs first (lrate/cl_rate/temp/drop/mode), then the
# capacity knobs (hyper_dim) that change compiled shapes.
TRIALS: list[dict] = [
    dict(name="bench-default", lrate=1e-3, cl_rate=0.01, temp=1.0, drop_rate=0.2),
    dict(name="no-ssl", lrate=1e-3, cl_rate=0.01, temp=1.0, drop_rate=0.2, mode="wossl"),
    dict(name="lr3e-3", lrate=3e-3, cl_rate=0.01, temp=1.0, drop_rate=0.2),
    dict(name="lr1e-2", lrate=1e-2, cl_rate=0.01, temp=1.0, drop_rate=0.2),
    dict(name="temp0.2", lrate=1e-3, cl_rate=0.01, temp=0.2, drop_rate=0.2),
    dict(name="cl0.1-temp0.2", lrate=1e-3, cl_rate=0.1, temp=0.2, drop_rate=0.2),
    dict(name="nodrop", lrate=1e-3, cl_rate=0.01, temp=1.0, drop_rate=0.0),
    dict(name="lr3e-3-nodrop", lrate=3e-3, cl_rate=0.01, temp=1.0, drop_rate=0.0),
    dict(name="dim256-lr3e-3", lrate=3e-3, cl_rate=0.01, temp=1.0, drop_rate=0.2,
         hyper_dim=256),
    dict(name="reg-weak", lrate=3e-3, cl_rate=0.01, temp=1.0, drop_rate=0.2,
         reg=0.001),
]
# round 2 (after the first sweep): the first-round trials all early-stop
# while recall is still climbing (best_epoch <= 88 of 300) — these run
# LONG with patience effectively off to measure true convergence, and
# probe the plateau-decay hypothesis (lr_decay=1.0 disables the
# ReduceLROnPlateau lr collapse).
TRIALS_LONG: list[dict] = [
    dict(name="long-lr3e-3", lrate=3e-3, cl_rate=0.01, temp=1.0, drop_rate=0.2),
    dict(name="long-lr3e-3-nodecay", lrate=3e-3, cl_rate=0.01, temp=1.0,
         drop_rate=0.2, lr_decay=1.0),
    dict(name="long-default-nodecay", lrate=1e-3, cl_rate=0.01, temp=1.0,
         drop_rate=0.2, lr_decay=1.0),
]
QUICK = {"bench-default", "no-ssl", "lr3e-3"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", default="all")
    ap.add_argument("--max_epoch", type=int, default=400)
    ap.add_argument("--early_stopping_steps", type=int, default=25)
    ap.add_argument("--evaluate_every", type=int, default=2)
    args = ap.parse_args()

    from hypergraph_diffusion_for_recommendation_tpu.core import make_config
    from hypergraph_diffusion_for_recommendation_tpu.data import (
        build_cf_device_data,
        build_interaction,
        build_kg_device_data,
        build_knowledge,
        synthetic_dataset,
    )
    from hypergraph_diffusion_for_recommendation_tpu.data import device as _dev
    from hypergraph_diffusion_for_recommendation_tpu.data.synthetic import (
        oracle_metrics,
    )
    from hypergraph_diffusion_for_recommendation_tpu.models import (
        build_model,
        model_data_needs,
    )
    from hypergraph_diffusion_for_recommendation_tpu.train import Trainer

    _dev.PALLAS_BF16 = True  # the bench's production compute mode

    t0 = time.time()
    train, test, kg_df = synthetic_dataset(
        n_users=1890, n_items=17632, mean_degree=49.0, seed=7, with_kg=True
    )
    inter = build_interaction(train, test)
    kg = build_knowledge(kg_df, inter)
    cf_dev = build_cf_device_data(
        inter, eval_user_multiple=512, needs=model_data_needs("KHGRec")
    )
    kg_dev = build_kg_device_data(kg)
    orc = oracle_metrics(train, test, n_users=1890, n_items=17632, n_clusters=16,
                         mean_degree=49.0, seed=7, cluster_seed=7, k=20)
    print(f"data+oracle in {time.time()-t0:.1f}s — Bayes ceiling recall@20 "
          f"{orc['recall']:.4f}, popularity-only {orc['recall_pop']:.4f}",
          flush=True)

    if args.trials == "long":
        trials = TRIALS_LONG
    elif args.trials == "all":
        trials = TRIALS
    else:
        trials = [t for t in TRIALS if t["name"] in QUICK]
    for trial in trials:
        spec = {k: v for k, v in trial.items() if k != "name"}
        cfg = make_config(
            "KHGRec",
            batch_size=2048, batch_size_kg=8192,
            hyper_dim=spec.pop("hyper_dim", 128), relation_dim=32,
            item_ranking=(10, 20, 40), eval_user_batch=512,
            max_epoch=args.max_epoch,
            early_stopping_steps=args.early_stopping_steps,
            evaluate_every=args.evaluate_every,
            mode=spec.pop("mode", "full"),
            **spec,
        )
        t0 = time.time()
        try:
            trainer = Trainer(build_model(cfg, cf_dev, kg_dev))
            res = trainer.fit(quiet=True)
        except Exception as e:  # noqa: BLE001 — keep sweeping
            print(f"{trial['name']}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        r20 = res.final_metrics[20]["recall"]
        row = dict(
            name=trial["name"], **{k: v for k, v in trial.items() if k != "name"},
            recall20=r20, ndcg20=res.final_metrics[20]["ndcg"],
            pct_oracle=round(r20 / orc["recall"] * 100, 1),
            best_epoch=res.best_epoch, wall_s=round(time.time() - t0, 1),
        )
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
