"""Reproduce the reference's full robustness matrix in one command.

The reference's committed results (`output.csv`, BASELINE.md) are the
LastFM robustness matrix: cold_start group 1, missing 10-50%, add_noise
10-50%, metrics at K in {10,20,40}, for the 8 headline models. This
script runs the SAME matrix against a real dataset directory and writes

  * `<out>/output.csv` — the reference's exact column schema
    (Model,Mode,Percentage,Hit Ratio@10,...,NDCG@40), so the two files
    diff row-for-row;
  * `<out>/RESULTS.md` — a side-by-side table against BASELINE.md's
    reference numbers for the rows BASELINE.md carries.

Usage (once a dataset in the reference format exists — see
docs/DATASETS.md for how to obtain/convert LastFM HetRec 2011 or ML-1M;
this sandbox has no network egress, so no real dataset ships here):

  python scripts/run_reference_matrix.py \
      --data_dir ./dataset --dataset lastfm \
      [--models HGNN,KHGRec,LightGCN,HCCF,SGL,SHT,KGAT,DHCF] \
      [--experiments cold_start,missing,add_noise] [--max_epoch 0=conf default]

Smoke test (synthetic data, tiny epochs — validates the harness only):

  python scripts/run_reference_matrix.py --dataset synthetic \
      --models LightGCN --experiments cold_start --max_epoch 2
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Reference rows from BASELINE.md (LastFM; K=20) for the side-by-side.
BASELINE_ROWS = {
    ("HGNN", "cold_start", 1): (0.2015, 0.0885, 0.20149, 0.20093),
    ("HCCF", "cold_start", 1): (0.20483, 0.08317, 0.20914, 0.18419),
    ("LightGCN", "cold_start", 1): (0.19495, 0.08563, 0.19402, 0.20993),
    ("SGL", "cold_start", 1): (0.20033, 0.08799, 0.19927, 0.21411),
    ("SHT", "cold_start", 1): (0.19799, 0.08696, 0.19801, 0.21556),
    ("KGAT", "cold_start", 1): (0.17288, 0.0702, 0.17227, 0.14573),
    ("DHCF", "cold_start", 1): (0.1849, 0.08121, 0.18369, 0.19838),
    ("HGNN", "missing", 10): (0.18698, 0.11528, 0.18868, 0.20371),
    ("HCCF", "missing", 10): (0.18043, 0.11124, 0.18214, 0.19885),
    ("LightGCN", "missing", 10): (0.22033, 0.13584, 0.22234, 0.24618),
    ("SGL", "missing", 10): (0.23115, 0.14251, 0.23322, 0.25358),
    ("SHT", "missing", 10): (0.19784, 0.12197, 0.19995, 0.22534),
    ("HGNN", "add_noise", 10): (0.12872, 0.0794, 0.12952, 0.13442),
    ("HCCF", "add_noise", 10): (0.13325, 0.08219, 0.1344, 0.14314),
    ("LightGCN", "add_noise", 10): (0.1641, 0.10122, 0.16515, 0.17675),
    ("SGL", "add_noise", 10): (0.16548, 0.10207, 0.16607, 0.17303),
}

DEFAULT_MODELS = ["HGNN", "KHGRec", "LightGCN", "HCCF", "SGL", "SHT", "KGAT",
                  "DHCF", "HGNN_HD3"]

# Per-model config overrides for the matrix (VERDICT r3 #2): every model
# must run in a SANE regime. SGL's pinned parity config (cl_rate 0.01,
# temp 0.2, node dropout) provably collapses BOTH implementations on
# planted-cluster data (PARITY_RUNS.md agreement-on-collapse row); the
# matrix is a robustness artifact, not a pathology probe, so SGL runs
# with the reference's kwargs-default temp=10 (the recovered regime —
# CL weight effectively annealed), where both sides reach
# LightGCN-level recall.
MODEL_OVERRIDES: dict[str, dict] = {
    # the reference's kwargs defaults (main.py: temp=10, cl_rate=0.01)
    # — the conf-mirror defaults (temp=0.2, cl_rate=0.1) are the
    # collapse regime on planted-cluster data
    "SGL": {"temp": 10.0, "cl_rate": 0.01},
}
HEADER = (
    "Model,Mode,Percentage,Hit Ratio@10,Precision@10,Recall@10,NDCG@10,"
    "Hit Ratio@20,Precision@20,Recall@20,NDCG@20,"
    "Hit Ratio@40,Precision@40,Recall@40,NDCG@40"
)
METRIC_ORDER = ("hit_ratio", "precision", "recall", "ndcg")


def run_cell(model: str, experiment: str, pct: int, args) -> dict:
    """One (model, experiment, percentage) training run -> best metrics."""
    from hypergraph_diffusion_for_recommendation_tpu.cli import load_dataset
    from hypergraph_diffusion_for_recommendation_tpu.core import make_config
    from hypergraph_diffusion_for_recommendation_tpu.data import (
        build_cf_device_data,
        build_interaction,
        build_kg_device_data,
        build_knowledge,
    )
    from hypergraph_diffusion_for_recommendation_tpu.models import (
        build_model,
        model_data_needs,
    )
    from hypergraph_diffusion_for_recommendation_tpu.train import Trainer

    overrides = dict(
        dataset=args.dataset, data_dir=args.data_dir,
        experiment=experiment, item_ranking=(10, 20, 40), seed=args.seed,
    )
    if experiment == "cold_start":
        overrides["group_id"] = pct
    elif experiment == "missing":
        overrides["missing_pct"] = pct
    elif experiment == "add_noise":
        overrides["noise_pct"] = pct
    if args.max_epoch:
        overrides["max_epoch"] = args.max_epoch
    overrides.update(MODEL_OVERRIDES.get(model, {}))
    cfg = make_config(model, **overrides)

    train, test, kg_df = load_dataset(cfg)
    inter = build_interaction(train, test)
    cf_dev = build_cf_device_data(inter, needs=model_data_needs(model))
    kg_dev = None
    if cfg.use_knowledge and kg_df is not None:
        kg_dev = build_kg_device_data(build_knowledge(kg_df, inter))
    trainer = Trainer(build_model(cfg, cf_dev, kg_dev))
    result = trainer.fit(quiet=True)
    # the reference's matrix reports the BEST epoch's metrics at every K
    # (fast_evaluation tracks best by vote; output CSVs aggregate bests)
    best_ep = result.best_epoch - 1
    for rec in result.history:
        if rec.epoch == best_ep:
            return rec.metrics
    return result.final_metrics


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="./dataset")
    ap.add_argument("--dataset", default="lastfm")
    ap.add_argument("--models", default=",".join(DEFAULT_MODELS))
    ap.add_argument("--experiments", default="cold_start,missing,add_noise")
    ap.add_argument("--percentages", default="10,20,30,40,50",
                    help="missing/add_noise percentages (cold_start uses group 1)")
    ap.add_argument("--max_epoch", type=int, default=0,
                    help="override epochs (0 = per-model conf default)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="./results/reference_matrix")
    ap.add_argument("--synthetic_provenance", action="store_true",
                    help="the data under --data_dir is synthetic even if "
                         "its directory tag says 'lastfm' (e.g. the parity "
                         "sandbox): suppresses the real-LastFM reference "
                         "columns in RESULTS.md")
    ap.add_argument("--force_cpu", type=int, default=0, metavar="N",
                    help="run on N virtual CPU devices instead of the TPU "
                         "(smoke tests; the axon plugin ignores "
                         "JAX_PLATFORMS so this must be in-process)")
    args = ap.parse_args()

    if args.force_cpu:
        from hypergraph_diffusion_for_recommendation_tpu.utils.platform import (
            force_virtual_cpu,
        )

        force_virtual_cpu(args.force_cpu)

    models = [m.strip() for m in args.models.split(",") if m.strip()]
    experiments = [e.strip() for e in args.experiments.split(",") if e.strip()]
    pcts = [int(p) for p in args.percentages.split(",")]

    os.makedirs(args.out, exist_ok=True)
    rows = []
    for model in models:
        for exp in experiments:
            cells = [1] if exp == "cold_start" else pcts
            for pct in cells:
                t0 = time.time()
                try:
                    metrics = run_cell(model, exp, pct, args)
                except Exception as e:  # keep the sweep going; record the hole
                    print(f"FAIL {model}/{exp}/{pct}: {type(e).__name__}: {e}",
                          flush=True)
                    continue
                vals = []
                for k in (10, 20, 40):
                    vals += [round(metrics[k][m], 5) for m in METRIC_ORDER]
                rows.append((model, exp, pct, vals))
                print(
                    f"{model:10s} {exp:10s} {pct:3d}  "
                    f"recall@20={metrics[20]['recall']:.5f} "
                    f"ndcg@20={metrics[20]['ndcg']:.5f}  ({time.time()-t0:.0f}s)",
                    flush=True,
                )

    csv_path = os.path.join(args.out, "output.csv")
    with open(csv_path, "w") as f:
        f.write(HEADER + "\n")
        for model, exp, pct, vals in rows:
            f.write(",".join([model, exp, str(pct)] + [str(v) for v in vals]) + "\n")

    md_path = os.path.join(args.out, "RESULTS.md")
    # the reference's committed rows are REAL-LastFM runs; printing them
    # beside synthetic-data cells without provenance invited a false
    # cross-dataset comparison (VERDICT r3 #2). Side-by-side columns only
    # appear when this run IS real LastFM; otherwise the table is
    # ours-only and the reference numbers are pointed to, not inlined.
    real_lastfm = args.dataset == "lastfm" and not args.synthetic_provenance
    with open(md_path, "w") as f:
        if real_lastfm:
            f.write(
                f"# Robustness matrix — {args.dataset} (real dataset)\n\n"
                "Side-by-side with the reference's committed REAL-LastFM "
                "numbers (BASELINE.md / reference output.csv). Reference "
                "cells exist only for the rows the reference committed. "
                "SGL runs in its recovered regime (temp=10 — see "
                "MODEL_OVERRIDES), not the collapse config PARITY_RUNS.md "
                "documents.\n\n"
                "| Model | Experiment | % | Recall@20 (ours, real LastFM) | "
                "Recall@20 (ref, real LastFM) | NDCG@20 (ours, real LastFM) "
                "| NDCG@20 (ref, real LastFM) |\n|---|---|---|---|---|---|---|\n"
            )
            for model, exp, pct, vals in rows:
                r20, n20 = vals[6], vals[7]
                ref = BASELINE_ROWS.get((model, exp, pct))
                rr = f"{ref[2]}" if ref else "—"
                rn = f"{ref[3]}" if ref else "—"
                f.write(f"| {model} | {exp} | {pct} | {r20} | {rr} | {n20} | {rn} |\n")
        else:
            f.write(
                f"# Robustness matrix — SYNTHETIC data (dataset tag "
                f"'{args.dataset}')\n\n"
                "DATA PROVENANCE: every cell below is planted-cluster "
                "SYNTHETIC data (no real dataset ships in this "
                "offline environment — the reference gitignores its "
                "dataset/). The reference's committed numbers are "
                "REAL-LastFM runs and are deliberately NOT printed beside "
                "these cells: absolute values across different datasets "
                "are not comparable. What this artifact demonstrates is "
                "the experiment MATRIX (cold-start quartiles, missing "
                "10-50%, noise 10-50%) running end-to-end with sane "
                "degradation trends per model. For absolute "
                "implementation parity on byte-identical data see "
                "PARITY_RUNS.md; for the reference's own numbers see "
                "BASELINE.md. SGL runs in its recovered regime (temp=10, "
                "MODEL_OVERRIDES) — its pinned parity config collapses "
                "BOTH implementations (PARITY_RUNS.md).\n\n"
                "| Model | Experiment | % | Recall@20 (ours, synthetic) | "
                "NDCG@20 (ours, synthetic) |\n|---|---|---|---|---|\n"
            )
            for model, exp, pct, vals in rows:
                r20, n20 = vals[6], vals[7]
                f.write(f"| {model} | {exp} | {pct} | {r20} | {n20} |\n")
    print(f"wrote {csv_path} and {md_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
