"""A/B: smoothed-recall early stopping vs the reference rule (ROADMAP open #4).

Background (PARITY_RUNS.md outlier notes): HCCF/SHT recall trajectories
plateau long before a late climb, so raw patience-15 stopping is a seed
lottery — 1-2 of 9 rebuild seeds stop in a bad basin (HCCF seed 8:
0.196 vs the 0.28-0.30 cluster; SHT seed 9: 0.101). The reference shows
the same pathology (ref_fixed ±0.021-0.026). `--early_stop_smooth=W`
runs the SAME patience rule on a trailing moving average of width W
(eval.early_stopping), leaving best-model selection on raw metrics.

This script reruns the exact parity protocol (same sandbox dataset,
pinned flags, max_epoch 80, patience 15) for both arms over N seeds and
writes results/stopping_rule_ab/{results.csv,RESULTS.md} with per-arm
mean ± std Recall@20 / NDCG@20, stop epochs, and wall time — the
evidence for whether smoothing rescues the collapsed seeds without
inflating the converged numbers or the epoch budget unreasonably.

Usage:
  python scripts/stopping_rule_ab.py                      # HCCF,SHT x 9 seeds x {1,5}
  python scripts/stopping_rule_ab.py --models HCCF --seeds 1,2,3 --windows 1,5
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from run_parity import COMMON, MODEL_FLAGS, SANDBOX, ensure_sandbox  # noqa: E402

OUT_DIR = os.path.join(ROOT, "results", "stopping_rule_ab")
CSV_PATH = os.path.join(OUT_DIR, "results.csv")
MD_PATH = os.path.join(OUT_DIR, "RESULTS.md")


def run_arm(model: str, seed: int, smooth: int, max_epoch: int,
            early_stop: int) -> dict | None:
    from hypergraph_diffusion_for_recommendation_tpu import cli

    argv = [f"--model={model}", f"--seed={seed}", f"--max_epoch={max_epoch}",
            f"--early_stopping_steps={early_stop}",
            f"--early_stop_smooth={smooth}",
            *COMMON, *MODEL_FLAGS.get(model, []),
            "--data_dir", os.path.join(SANDBOX, "dataset"),
            "--output_dir", os.path.join(OUT_DIR, "runs"),
            "--item_ranking", "10,20,40", "--quiet"]
    t0 = time.time()
    try:
        result = cli.main(argv)
    except Exception as e:  # noqa: BLE001 — recorded per-run in the artifact
        print(f"  {model} s{seed} w{smooth}: FAILED {type(e).__name__}: {e}")
        return None
    m = result.final_metrics
    return dict(
        model=model, smooth=smooth, seed=seed,
        recall20=m[20]["recall"], ndcg20=m[20]["ndcg"],
        best_epoch=result.best_epoch, stop_epoch=len(result.history),
        wall_s=round(time.time() - t0, 1),
    )


def write_markdown(rows: list[dict], max_epoch: int, early_stop: int) -> None:
    import numpy as np

    models = sorted({r["model"] for r in rows})
    windows = sorted({r["smooth"] for r in rows})
    lines = [
        "# Smoothed-recall early stopping A/B",
        "",
        "Same parity protocol as PARITY_RUNS.md (planted-cluster synthetic, "
        f"pinned flags, max_epoch {max_epoch}, patience {early_stop}); the "
        "only variable is `--early_stop_smooth` (1 = reference-parity raw "
        "recall signal; W>1 = trailing moving average of width W for the "
        "STOP decision only — best-model selection stays on raw metrics). "
        "Reproduce: `python scripts/stopping_rule_ab.py`.",
        "",
        "| Model | window | Recall@20 | NDCG@20 | min R@20 | stop epoch | "
        "wall s/run |",
        "|---|---|---|---|---|---|---|",
    ]
    for m in models:
        for w in windows:
            sel = [r for r in rows if r["model"] == m and r["smooth"] == w]
            if not sel:
                continue
            rec = np.array([r["recall20"] for r in sel])
            ndcg = np.array([r["ndcg20"] for r in sel])
            ep = np.array([r["stop_epoch"] for r in sel])
            ws = np.array([r["wall_s"] for r in sel])
            lines.append(
                f"| {m} | {w} | {rec.mean():.4f}±{rec.std():.4f} | "
                f"{ndcg.mean():.4f}±{ndcg.std():.4f} | {rec.min():.4f} | "
                f"{ep.mean():.1f} | {ws.mean():.0f} |"
            )
    lines += ["", f"Seeds per arm: {len(rows) // max(1, len(models) * len(windows))}. "
              "Raw rows: results.csv."]
    with open(MD_PATH, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {MD_PATH}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", type=str, default="HCCF,SHT")
    ap.add_argument("--seeds", type=str, default="1,2,3,4,5,6,7,8,9")
    ap.add_argument("--windows", type=str, default="1,5")
    ap.add_argument("--max_epoch", type=int, default=80)
    ap.add_argument("--early_stopping_steps", type=int, default=15)
    args = ap.parse_args()

    ensure_sandbox()
    os.makedirs(OUT_DIR, exist_ok=True)
    rows: list[dict] = []
    fields = ["model", "smooth", "seed", "recall20", "ndcg20",
              "best_epoch", "stop_epoch", "wall_s"]
    exists = os.path.exists(CSV_PATH)
    with open(CSV_PATH, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        if not exists:
            w.writeheader()
        for model in args.models.split(","):
            for smooth in (int(x) for x in args.windows.split(",")):
                for seed in (int(s) for s in args.seeds.split(",")):
                    res = run_arm(model, seed, smooth, args.max_epoch,
                                  args.early_stopping_steps)
                    if res:
                        rows.append(res)
                        w.writerow(res)
                        f.flush()
                        print(f"{model} s{seed} w{smooth}: recall@20="
                              f"{res['recall20']:.4f} stop_ep={res['stop_epoch']}"
                              f" ({res['wall_s']}s)")

    # include any previously recorded rows in the aggregate
    with open(CSV_PATH) as f:
        all_rows = [
            {k: (float(v) if k in ("recall20", "ndcg20", "wall_s") else
                 int(v) if k in ("smooth", "seed", "best_epoch", "stop_epoch")
                 else v)
             for k, v in r.items()}
            for r in csv.DictReader(f)
        ]
    write_markdown(all_rows, args.max_epoch, args.early_stopping_steps)


if __name__ == "__main__":
    main()
