"""Model comparison on the HIERARCHICAL sparse synthetic regime.

The flat planted-cluster synthetic saturates within ~10 epochs for every
model because 1-hop co-occurrence already carries the signal
(BENCH_NOTES model table). This regime plants a two-level cluster tree
(coarse families of sibling fine clusters) and keeps user degree LOW, so
a user's few train edges scatter across the coarse family and the fine
cluster is only recoverable by aggregating evidence across structurally
similar users — the multi-hop / hypergraph-diffusion setting.

Prints one JSON line per model (same schema as ml1m_compare.py).

Run: timeout 7200 python scripts/hard_regime_compare.py [model ...]
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
    ap.add_argument("--users", type=int, default=1890)
    ap.add_argument("--items", type=int, default=4000)
    ap.add_argument("--coarse", type=int, default=8)
    ap.add_argument("--fine-per", type=int, default=8)
    ap.add_argument("--degree", type=float, default=10.0)
    ap.add_argument("--min-degree", type=int, default=3)
    ap.add_argument("--affinity", type=float, default=8.0)
    ap.add_argument("--sibling", type=float, default=None)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--early-stop", type=int, default=10)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

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

    models = list(args.models) or ["LightGCN", "HCCF", "HGNN_HD3", "KHGRec"]
    need_kg = any(m in ("KHGRec", "KGAT", "HGNN", "HD2") for m in models)
    train, test, kg_df = synthetic_dataset(
        n_users=args.users, n_items=args.items, mean_degree=args.degree,
        seed=args.seed, with_kg=need_kg,
        hierarchy=(args.coarse, args.fine_per),
        sibling_affinity=args.sibling, affinity=args.affinity,
        min_degree=args.min_degree,
    )
    inter = build_interaction(train, test)
    cf_dev = build_cf_device_data(inter, eval_user_multiple=512)
    kg_dev = None
    if need_kg:
        kg_dev = build_kg_device_data(build_knowledge(kg_df, inter))
    chance = 20.0 / inter.n_items
    print(
        f"# hierarchical regime: {inter.n_users} users / {inter.n_items} items / "
        f"{inter.n_cf_train} train edges, {args.coarse}x{args.fine_per} clusters, "
        f"chance recall@20 ~ {chance:.4f}",
        file=sys.stderr, flush=True,
    )

    for model in models:
        cfg = make_config(
            model, batch_size=2048, item_ranking=(20,), eval_user_batch=512,
            max_epoch=args.epochs, early_stopping_steps=args.early_stop,
            evaluate_every=1,
        )
        uses_kg = cfg.use_knowledge
        t0 = time.time()
        tr = Trainer(build_model(cfg, cf_dev, kg_dev if uses_kg else None))
        res = tr.fit(quiet=True)
        dt = time.time() - t0
        times = sorted(r.train_time for r in res.history[1:]) or [0.0]
        ep_t = times[len(times) // 2]
        print(json.dumps({
            "model": model,
            "best_recall@20": res.best_metrics.get("recall"),
            "best_ndcg@20": res.best_metrics.get("ndcg"),
            "vs_chance": round(res.best_metrics.get("recall", 0.0) / chance, 1),
            "best_epoch": res.best_epoch,
            "epochs_run": len(res.history),
            "epoch_sec": round(ep_t, 2),
            "total_sec": round(dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
