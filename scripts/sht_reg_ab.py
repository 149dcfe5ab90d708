"""SHT regularisation-semantics A/B (VERDICT r4 weak #4 product fix).

Under the pinned parity config (reg=0.01) the reference's SHT
regularises the FULL parameter tables every step (calcRegLoss,
SHT.py:234-239) — unlike every other model in its own codebase, which
regularises batch rows (util/loss_torch.py:17-21). On some seeds the
full-table pull exceeds the batch learning signal: embedding norms decay
to zero, the loss freezes at ln4, and converged recall is a seed lottery
(both implementations; results/stopping_rule_ab/RESULTS.md finding 3).

The product default `--sht_reg=batch` aligns SHT with the batch-row
convention; `--sht_reg=full` keeps the reference's exact semantics.
This script reruns the exact parity protocol over N seeds for both arms
and writes results/sht_reg_ab/{results.csv,RESULTS.md} — the evidence
that the fix removes the lottery (spread ~±0.005) without trading away
the mean.

Usage:
  python scripts/sht_reg_ab.py                 # 9 seeds x {batch, full}
  python scripts/sht_reg_ab.py --seeds 1,2,3 --arms batch
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

OUT_DIR = os.path.join(ROOT, "results", "sht_reg_ab")
CSV_PATH = os.path.join(OUT_DIR, "results.csv")
MD_PATH = os.path.join(OUT_DIR, "RESULTS.md")


def run_arm(arm: str, seed: int, max_epoch: int, early_stop: int) -> dict | None:
    from hypergraph_diffusion_for_recommendation_tpu import cli

    argv = ["--model=SHT", f"--seed={seed}", f"--max_epoch={max_epoch}",
            f"--early_stopping_steps={early_stop}",
            "--early_stop_smooth=1", f"--sht_reg={arm}",
            *COMMON, *MODEL_FLAGS.get("SHT", []),
            "--data_dir", os.path.join(SANDBOX, "dataset"),
            "--output_dir", os.path.join(OUT_DIR, "runs"),
            "--item_ranking", "10,20,40", "--quiet"]
    t0 = time.time()
    try:
        result = cli.main(argv)
    except Exception as e:  # noqa: BLE001 — recorded per-run
        print(f"  SHT {arm} s{seed}: FAILED {type(e).__name__}: {e}")
        return None
    m = result.final_metrics
    return dict(
        arm=arm, seed=seed,
        recall20=m[20]["recall"], ndcg20=m[20]["ndcg"],
        best_epoch=result.best_epoch, stop_epoch=len(result.history),
        wall_s=round(time.time() - t0, 1),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", type=str, default="batch,full")
    ap.add_argument("--seeds", type=str, default="1,2,3,4,5,6,7,8,9")
    ap.add_argument("--max_epoch", type=int, default=80)
    ap.add_argument("--early_stopping_steps", type=int, default=15)
    ap.add_argument("--report_only", action="store_true")
    args = ap.parse_args()

    ensure_sandbox()
    os.makedirs(OUT_DIR, exist_ok=True)
    fields = ["arm", "seed", "recall20", "ndcg20", "best_epoch",
              "stop_epoch", "wall_s"]
    if not args.report_only:
        exists = os.path.exists(CSV_PATH)
        with open(CSV_PATH, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields, extrasaction="ignore")
            if not exists:
                w.writeheader()
            for arm in args.arms.split(","):
                for seed in (int(s) for s in args.seeds.split(",")):
                    res = run_arm(arm, seed, args.max_epoch,
                                  args.early_stopping_steps)
                    if res:
                        w.writerow(res)
                        f.flush()
                        print(f"SHT {arm} s{seed}: "
                              f"recall@20={res['recall20']:.4f} "
                              f"stop_ep={res['stop_epoch']} "
                              f"({res['wall_s']}s)")

    import numpy as np

    with open(CSV_PATH) as f:
        rows = [dict(r, recall20=float(r["recall20"]),
                     ndcg20=float(r["ndcg20"]))
                for r in csv.DictReader(f)]
    lines = [
        "# SHT regularisation-semantics A/B (norm-collapse product fix)",
        "",
        "Exact parity protocol (planted-cluster synthetic, pinned SHT "
        f"flags incl. reg=0.01, max_epoch {args.max_epoch}, patience "
        f"{args.early_stopping_steps}); the variable is `--sht_reg`: "
        "`full` = the reference's calcRegLoss (squared norms of ALL "
        "parameter tables every step — SHT.py:234-239, unique in its own "
        "codebase), `batch` = the product default (batch-row squared L2 "
        "+ hyperedge-table weight decay — the util/loss_torch.py "
        "convention every other model uses). Reference comparison "
        "columns: PARITY_RUNS.md SHT rows (ref_fixed 9-seed "
        "0.133±0.021). Reproduce: `python scripts/sht_reg_ab.py`.",
        "",
        "| sht_reg | Recall@20 | NDCG@20 | min R@20 | max R@20 | best epoch |",
        "|---|---|---|---|---|---|",
    ]
    for arm in ("batch", "full"):
        sel = [r for r in rows if r["arm"] == arm]
        if not sel:
            continue
        rec = np.array([r["recall20"] for r in sel])
        nd = np.array([r["ndcg20"] for r in sel])
        be = np.array([float(r["best_epoch"]) for r in sel])
        lines.append(
            f"| {arm} | {rec.mean():.4f}±{rec.std():.4f} | "
            f"{nd.mean():.4f}±{nd.std():.4f} | {rec.min():.4f} | "
            f"{rec.max():.4f} | {be.mean():.0f} |"
        )
    lines += ["", f"Seeds: {args.seeds}. Raw rows: results.csv."]
    with open(MD_PATH, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {MD_PATH}")


if __name__ == "__main__":
    main()
