"""Converged-quality A/B for cached-propagation training (prop_cache_steps).

`--prop_cache_steps K` trains KHGRec on cached propagated tables
refreshed by a true full-graph step every K steps, with straight-through
gradients between refreshes (models/khgrec.py cached_loss) — the
full-graph spmm chains are skipped on K-1 of K steps, a large measured
epoch speedup at multi-M-nnz scale (BENCH_NOTES round 5). The open
question is METRIC cost: parameters inside the propagation (LayerNorms,
attention fusion) only train on full steps, and between-refresh
gradients carry only each row's own-embedding component.

This script measures converged Recall@20/NDCG@20 on the ML-1M-density
KHGRec task (the int8_quality_ab protocol: same shapes, seeds, budget;
fresh subprocess per arm) for K in {off, 4, 8}.

Writes results/prop_cache_ab/RESULTS.md + results.csv.

Usage: python scripts/prop_cache_ab.py [--ks 0,4,8] [--seeds 1,2,3]
       [--epochs 60]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT_DIR = os.path.join(ROOT, "results", "prop_cache_ab")


def child(k: int, seed: int, epochs: int, model: str = "KHGRec") -> None:
    from hypergraph_diffusion_for_recommendation_tpu.data import device as _dev

    _dev.PALLAS_BF16 = True  # production compute mode (bench.py parity)

    from hypergraph_diffusion_for_recommendation_tpu.core import make_config
    from hypergraph_diffusion_for_recommendation_tpu.data import (
        build_cf_device_data, build_interaction, build_kg_device_data,
        build_knowledge, synthetic_dataset,
    )
    from hypergraph_diffusion_for_recommendation_tpu.models import (
        build_model, model_data_needs,
    )
    from hypergraph_diffusion_for_recommendation_tpu.train import Trainer

    train, test, kg_df = synthetic_dataset(
        n_users=1500, n_items=1000, mean_degree=120.0, seed=9, with_kg=True
    )
    inter = build_interaction(train, test)
    cf = build_cf_device_data(
        inter, eval_user_multiple=512, needs=model_data_needs(model)
    )
    kgd = None
    if model == "KHGRec":
        kg = build_knowledge(kg_df, inter)
        kgd = build_kg_device_data(kg)
    model_kw = (
        dict(batch_size_kg=8192, relation_dim=32, temp=1.0, cl_rate=0.01,
             mode="full") if model == "KHGRec"
        else dict(cl_rate=1e-5, temp=0.2, reg=0.1)  # HGNN_HD3 parity flags
    )
    cfg = make_config(
        model, seed=seed, batch_size=2048,
        hyper_dim=128, item_ranking=(10, 20),
        eval_user_batch=512, max_epoch=epochs, early_stopping_steps=15,
        lrate=0.001, drop_rate=0.2,
        prop_cache_steps=k, **model_kw,
    )
    trainer = Trainer(build_model(cfg, cf, kgd))
    t0 = time.time()
    res = trainer.fit(quiet=True)
    m = res.final_metrics[20]
    print(json.dumps(dict(
        k=k, seed=seed,
        recall20=m["recall"], ndcg20=m["ndcg"],
        best_epoch=res.best_epoch, epochs=len(res.history),
        wall_s=round(time.time() - t0, 1),
    )), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", type=str, default="0,4,8")
    ap.add_argument("--seeds", type=str, default="1,2,3")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--model", type=str, default="KHGRec",
                    choices=["KHGRec", "HGNN_HD3"])
    ap.add_argument("--child_arm", type=str, default="")
    args = ap.parse_args()

    if args.child_arm:
        k, seed = args.child_arm.split(":")
        child(int(k), int(seed), args.epochs, args.model)
        return

    out_dir = OUT_DIR if args.model == "KHGRec" else OUT_DIR + "_hd3"
    csv_path = os.path.join(out_dir, "results.csv")
    md_path = os.path.join(out_dir, "RESULTS.md")
    os.makedirs(out_dir, exist_ok=True)
    rows: list[dict] = []
    for k in (int(x) for x in args.ks.split(",")):
        for seed in (int(s) for s in args.seeds.split(",")):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 f"--child_arm={k}:{seed}", f"--epochs={args.epochs}",
                 f"--model={args.model}"],
                cwd=ROOT, capture_output=True, text=True, timeout=2400,
            )
            line = next((ln for ln in proc.stdout.splitlines()
                         if ln.startswith("{")), None)
            if proc.returncode != 0 or line is None:
                print(f"K={k} s{seed}: FAILED rc={proc.returncode}\n"
                      f"{proc.stderr[-800:]}")
                continue
            row = json.loads(line)
            rows.append(row)
            print(f"K={k} s{seed}: recall@20={row['recall20']:.4f} "
                  f"ndcg@20={row['ndcg20']:.4f} ({row['wall_s']}s)")

    fields = ["k", "seed", "recall20", "ndcg20", "best_epoch",
              "epochs", "wall_s"]
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)

    import numpy as np

    lines = [
        "# Cached-propagation (prop_cache_steps) converged-quality A/B",
        "",
        f"ML-1M-density {args.model} (1500x1000 deg-120 synthetic + KG), bf16 "
        f"compute, {args.epochs}-epoch budget, patience 15 — the "
        "int8_quality_ab protocol. K=0 is the reference-parity full-loss "
        "path; K>1 refreshes cached propagated tables every K-th step "
        "and trains the steps between with straight-through gradients "
        "(models/khgrec.py). Fresh subprocess per arm. Reproduce: "
        "`python scripts/prop_cache_ab.py`.",
        "",
        "| prop_cache_steps | Recall@20 | NDCG@20 | best epoch | wall s/run |",
        "|---|---|---|---|---|",
    ]
    for k in (int(x) for x in args.ks.split(",")):
        sel = [r for r in rows if r["k"] == k]
        if not sel:
            continue
        rec = np.array([r["recall20"] for r in sel])
        nd = np.array([r["ndcg20"] for r in sel])
        be = np.array([r["best_epoch"] for r in sel])
        ws = np.array([r["wall_s"] for r in sel])
        label = "off" if k <= 1 else str(k)
        lines.append(
            f"| {label} | {rec.mean():.4f}±{rec.std():.4f} | "
            f"{nd.mean():.4f}±{nd.std():.4f} | {be.mean():.0f} | "
            f"{ws.mean():.0f} |"
        )
    lines += ["", f"Seeds: {args.seeds}. Raw rows: results.csv."]
    with open(md_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {md_path}")


if __name__ == "__main__":
    main()
