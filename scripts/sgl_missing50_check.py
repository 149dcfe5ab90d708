"""Diagnose the SGL missing-50% robustness-matrix cell (VERDICT r4 weak #7).

The committed matrix (results/reference_matrix_synthetic) shows SGL in
its recovered regime (temp=10) at 0.1619 recall@20 with 40% of train
interactions removed but 0.0306 at 50% — the signature of the CL
collapse resurfacing at sparse data. This script runs the controls that
decide between the two hypotheses:

  * seed artifact?      -> missing-50 over 3 seeds (recovered config)
  * CL-driven collapse? -> missing-50 with cl_rate=0 (pure SGL-graph
                           BPR; if CL is the mechanism, this recovers)
  * cliff location?     -> missing-45 (recovered config)

Writes results/reference_matrix_synthetic/sgl_missing50.csv and prints a
diagnosis; the RESULTS.md note is added by hand from the outcome.

Usage: python scripts/sgl_missing50_check.py
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from run_parity import SANDBOX, ensure_sandbox  # noqa: E402

OUT_CSV = os.path.join(ROOT, "results", "reference_matrix_synthetic",
                       "sgl_missing50.csv")


def run_cell(pct: int, seed: int, cl_rate: float, temp: float) -> dict:
    from hypergraph_diffusion_for_recommendation_tpu.cli import load_dataset
    from hypergraph_diffusion_for_recommendation_tpu.core import make_config
    from hypergraph_diffusion_for_recommendation_tpu.data import (
        build_cf_device_data, build_interaction,
    )
    from hypergraph_diffusion_for_recommendation_tpu.models import (
        build_model, model_data_needs,
    )
    from hypergraph_diffusion_for_recommendation_tpu.train import Trainer

    cfg = make_config(
        "SGL", dataset="lastfm", data_dir=os.path.join(SANDBOX, "dataset"),
        experiment="missing", missing_pct=pct, seed=seed,
        item_ranking=(10, 20, 40), temp=temp, cl_rate=cl_rate,
    )
    train, test, _ = load_dataset(cfg)
    inter = build_interaction(train, test)
    cf_dev = build_cf_device_data(inter, needs=model_data_needs("SGL"))
    trainer = Trainer(build_model(cfg, cf_dev, None))
    result = trainer.fit(quiet=True)
    best_ep = result.best_epoch - 1
    metrics = next((r.metrics for r in result.history if r.epoch == best_ep),
                   result.final_metrics)
    return dict(pct=pct, seed=seed, cl_rate=cl_rate, temp=temp,
                recall20=metrics[20]["recall"], ndcg20=metrics[20]["ndcg"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", default="50:0:0.01:10,50:1:0.01:10,50:2:0.01:10,"
                                       "50:0:0:10,50:1:0:10,45:0:0.01:10")
    args = ap.parse_args()

    ensure_sandbox()
    os.makedirs(os.path.dirname(OUT_CSV), exist_ok=True)
    rows = []
    for cell in args.cells.split(","):
        pct, seed, cl, temp = cell.split(":")
        r = run_cell(int(pct), int(seed), float(cl), float(temp))
        rows.append(r)
        print(f"missing-{r['pct']} seed {r['seed']} cl_rate={r['cl_rate']} "
              f"temp={r['temp']}: recall@20={r['recall20']:.4f} "
              f"ndcg@20={r['ndcg20']:.4f}", flush=True)
    with open(OUT_CSV, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {OUT_CSV}")


if __name__ == "__main__":
    main()
