"""KHGRec parity in the reference's own kwargs-default regime.

PARITY_RUNS.md's KHGRec row shows the reference collapsing under the
pinned parity config (ref_fixed 0.127-0.159 vs rebuild 0.368) — known
reference defects (self-contrast SSL term, per-batch CPU sparse-softmax
refresh) are the suspected mechanism. This script runs BOTH sides under
the reference's OWN kwargs defaults (main.py argparse: hyper_dim=32,
temp=10, cl_rate=0.01 — the config its committed results were produced
closest to, and its best observed regime in this environment: ~0.26 in
the round-3 unpinned pass), corrected top-K on the reference side.
If the rebuild also wins here, the KHGRec gap is implementation quality
in every regime, not a config artifact.

Writes parity/khgrec_kwargs.csv; reference stdout under
parity/logs/khgrec_kwargs/. Usage:
  python scripts/khgrec_kwargs_check.py [--seeds 1,2,3] [--sides both]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

import run_parity  # noqa: E402

OUT = os.path.join(ROOT, "parity", "khgrec_kwargs.csv")

# the reference's argparse defaults for the knobs KHGRec reads from
# kwargs (main.py:20-95): hyper_dim 32, temp 10, cl_rate 0.01, lr 1e-3.
KWARGS_DEFAULT = ["--batch_size_kg=4096", "--hyper_dim=32",
                  "--relation_dim=32", "--temp=10", "--cl_rate=0.01",
                  "--drop_rate=0.2", "--p=0.3", "--reg=0.01",
                  "--reg_kg=0.01", "--n_layers=2"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=str, default="1,2,3")
    ap.add_argument("--sides", type=str, default="both",
                    choices=("ref", "rebuild", "both"))
    ap.add_argument("--max_epoch", type=int, default=80)
    ap.add_argument("--early_stopping_steps", type=int, default=15)
    args = ap.parse_args()

    run_parity.ensure_sandbox()
    run_parity.MODEL_FLAGS["KHGRec"] = KWARGS_DEFAULT
    log_dir = os.path.join(ROOT, "parity", "logs", "khgrec_kwargs")
    os.makedirs(log_dir, exist_ok=True)

    rows = []
    if os.path.exists(OUT):  # resumable across invocations
        rows = list(csv.DictReader(open(OUT)))

    def save() -> None:
        fields = ["model", "side", "seed", "max_epoch",
                  "recall@10", "ndcg@10", "recall@20", "ndcg@20",
                  "recall@40", "ndcg@40", "hit@20", "prec@20", "wall_s"]
        with open(OUT, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields)
            w.writeheader()
            w.writerows(rows)

    seeds = [int(s) for s in args.seeds.split(",")]
    if args.sides in ("rebuild", "both"):
        for seed in seeds:
            if any(r["side"] == "rebuild_kwargs" and int(r["seed"]) == seed
                   for r in rows):
                continue
            res = run_parity.run_rebuild("KHGRec", seed, args.max_epoch,
                                         args.early_stopping_steps)
            if res:
                rows.append(run_parity.flatten("KHGRec", "rebuild_kwargs",
                                               seed, args.max_epoch, res))
                save()
                print(f"rebuild s{seed}: recall@20="
                      f"{res['metrics'][20]['recall']:.4f} ({res['wall_s']:.0f}s)")
    if args.sides in ("ref", "both"):
        for seed in seeds:
            if any(r["side"] == "ref_fixed_kwargs" and int(r["seed"]) == seed
                   for r in rows):
                continue
            res = run_parity.run_reference("KHGRec", seed, args.max_epoch,
                                           args.early_stopping_steps,
                                           log_dir, fix_topk=True)
            if res:
                rows.append(run_parity.flatten("KHGRec", "ref_fixed_kwargs",
                                               seed, args.max_epoch, res))
                save()
                print(f"ref_fixed s{seed}: recall@20="
                      f"{res['metrics'][20]['recall']:.4f} ({res['wall_s']:.0f}s)")

    import numpy as np

    for side in ("ref_fixed_kwargs", "rebuild_kwargs"):
        sel = [float(r["recall@20"]) for r in rows if r["side"] == side]
        if sel:
            print(f"{side}: recall@20 {np.mean(sel):.4f}±{np.std(sel):.4f} n={len(sel)}")


if __name__ == "__main__":
    main()
