"""Converged-quality A/B for the quantised gather layouts (int8 paths).

The int8 / dedup_int8 layouts quantise the PALLAS segment-SpMM's
gathered operand to int8 (per-block scale; exact f32 backward) for a
measured 1.78-1.92x epoch speedup at ML-1M density (BENCH_NOTES layout
table). The known cost is ~1% relative error on the propagation
FORWARD — this script measures what that does to the metric that
matters: converged Recall@20/NDCG@20 on an ML-1M-density KHGRec task
(the exact bench.py secondary-phase shape), same seeds, bf16 compute,
layouts {auto(=dedup at this density), dedup_int8}.

Each arm runs in a fresh subprocess (the pallas layout globals are read
at device-data PACK time, and XLA compile caches keyed on layout
constants must not leak across arms).

Writes results/int8_quality_ab/RESULTS.md + results.csv.

Usage: python scripts/int8_quality_ab.py [--seeds 1,2,3] [--epochs 60]
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
sys.path.insert(0, ROOT)  # child subprocesses start with scripts/ as sys.path[0]
OUT_DIR = os.path.join(ROOT, "results", "int8_quality_ab")
CSV_PATH = os.path.join(OUT_DIR, "results.csv")
MD_PATH = os.path.join(OUT_DIR, "RESULTS.md")


def child(layout: str, seed: int, epochs: int) -> None:
    """Runs ONE arm and prints a single JSON result line."""
    from hypergraph_diffusion_for_recommendation_tpu.data import device as _dev

    _dev.PALLAS_BF16 = True  # production compute mode (bench.py parity)
    _dev.PALLAS_DEDUP = "1" if layout in ("dedup", "dedup_int8") else (
        "auto" if layout == "auto" else "0")
    _dev.PALLAS_INT8 = layout in ("int8", "dedup_int8")

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
    kg = build_knowledge(kg_df, inter)
    cf = build_cf_device_data(
        inter, eval_user_multiple=512, needs=model_data_needs("KHGRec")
    )
    kgd = build_kg_device_data(kg)
    cfg = make_config(
        "KHGRec", seed=seed, batch_size=2048, batch_size_kg=8192,
        hyper_dim=128, relation_dim=32, item_ranking=(10, 20),
        eval_user_batch=512, max_epoch=epochs, early_stopping_steps=15,
        lrate=0.001, temp=1.0, cl_rate=0.01, drop_rate=0.2, mode="full",
    )
    trainer = Trainer(build_model(cfg, cf, kgd))
    t0 = time.time()
    res = trainer.fit(quiet=True)
    m = res.final_metrics[20]
    print(json.dumps(dict(
        layout=layout, seed=seed,
        recall20=m["recall"], ndcg20=m["ndcg"],
        best_epoch=res.best_epoch, epochs=len(res.history),
        wall_s=round(time.time() - t0, 1),
    )), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--layouts", type=str, default="auto,dedup_int8")
    ap.add_argument("--seeds", type=str, default="1,2,3")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--child_arm", type=str, default="")
    args = ap.parse_args()

    if args.child_arm:
        layout, seed = args.child_arm.split(":")
        child(layout, int(seed), args.epochs)
        return

    os.makedirs(OUT_DIR, exist_ok=True)
    rows: list[dict] = []
    for layout in args.layouts.split(","):
        for seed in (int(s) for s in args.seeds.split(",")):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 f"--child_arm={layout}:{seed}", f"--epochs={args.epochs}"],
                cwd=ROOT, capture_output=True, text=True, timeout=1800,
            )
            line = next((ln for ln in proc.stdout.splitlines()
                         if ln.startswith("{")), None)
            if proc.returncode != 0 or line is None:
                print(f"{layout} s{seed}: FAILED rc={proc.returncode}\n"
                      f"{proc.stderr[-800:]}")
                continue
            row = json.loads(line)
            rows.append(row)
            print(f"{layout} s{seed}: recall@20={row['recall20']:.4f} "
                  f"ndcg@20={row['ndcg20']:.4f} ({row['wall_s']}s)")

    fields = ["layout", "seed", "recall20", "ndcg20", "best_epoch",
              "epochs", "wall_s"]
    with open(CSV_PATH, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)

    import numpy as np

    lines = [
        "# int8 gather-layout converged-quality A/B",
        "",
        "ML-1M-density KHGRec (1500x1000 deg-120 synthetic + KG — the "
        "bench.py secondary-phase shape, where the quantised layouts' "
        "1.78-1.92x epoch speedups apply), bf16 compute, "
        f"{args.epochs}-epoch budget, patience 15. `auto` resolves to the "
        "dedup layout at this density (exact f32-accumulated gather); "
        "`dedup_int8` adds int8 quantisation of the gathered operand "
        "(~1% relative forward error, exact f32 backward). Fresh "
        "subprocess per arm. Reproduce: `python scripts/int8_quality_ab.py`.",
        "",
        "| layout | Recall@20 | NDCG@20 | best epoch |",
        "|---|---|---|---|",
    ]
    for layout in args.layouts.split(","):
        sel = [r for r in rows if r["layout"] == layout]
        if not sel:
            continue
        rec = np.array([r["recall20"] for r in sel])
        nd = np.array([r["ndcg20"] for r in sel])
        be = np.array([r["best_epoch"] for r in sel])
        lines.append(
            f"| {layout} | {rec.mean():.4f}±{rec.std():.4f} | "
            f"{nd.mean():.4f}±{nd.std():.4f} | {be.mean():.0f} |"
        )
    lines += ["", f"Seeds: {args.seeds}. Raw rows: results.csv."]
    with open(MD_PATH, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {MD_PATH}")


if __name__ == "__main__":
    main()
