"""SGL recovered-regime parity check (completes the agreement-on-collapse story).

PARITY_RUNS.md's SGL row documents that BOTH implementations collapse to
~0.035 recall@20 under the pinned (cl_rate 0.01, temp 0.2, node-drop)
config — agreement on a pathological config. This script runs the OTHER
half of that argument: both sides under the RECOVERED regime (the
reference's kwargs-default temp=10, which effectively anneals the CL
term — the same regime the robustness matrix uses, MODEL_OVERRIDES in
run_reference_matrix.py), same data/seeds/protocol, reference side with
the corrected top-K. If both sides recover to LightGCN-level recall and
agree within seed noise, the SGL implementations match in BOTH regimes.

Writes parity/sgl_recovered.csv. Usage:
  python scripts/sgl_recovered_check.py [--seeds 1,2,3] [--max_epoch 80]
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

OUT = os.path.join(ROOT, "parity", "sgl_recovered.csv")

# the reference's kwargs-default CL regime (main.py: temp=10), node-drop
# as in the pinned row; everything else identical to the pinned config
RECOVERED = ["--reg=0.1", "--cl_rate=0.01", "--temp=10", "--drop_rate=0.1",
             "--aug_type=0"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=str, default="1,2,3")
    ap.add_argument("--max_epoch", type=int, default=80)
    ap.add_argument("--early_stopping_steps", type=int, default=15)
    args = ap.parse_args()

    run_parity.ensure_sandbox()
    run_parity.MODEL_FLAGS["SGL"] = RECOVERED  # both runners read this
    # own log subdir: the main parity logs keep the PINNED-config stdout
    # under the same ref_fixed_SGL_s<N>.log names
    log_dir = os.path.join(ROOT, "parity", "logs", "sgl_recovered")
    os.makedirs(log_dir, exist_ok=True)

    rows = []
    for seed in (int(s) for s in args.seeds.split(",")):
        res = run_parity.run_reference(
            "SGL", seed, args.max_epoch, args.early_stopping_steps,
            log_dir, fix_topk=True,
        )
        if res:
            rows.append(run_parity.flatten("SGL", "ref_fixed_recovered",
                                           seed, args.max_epoch, res))
            print(f"ref_fixed  s{seed}: recall@20={res['metrics'][20]['recall']:.4f} "
                  f"ndcg@20={res['metrics'][20]['ndcg']:.4f} ({res['wall_s']:.0f}s)")
    for seed in (int(s) for s in args.seeds.split(",")):
        res = run_parity.run_rebuild(
            "SGL", seed, args.max_epoch, args.early_stopping_steps,
        )
        if res:
            rows.append(run_parity.flatten("SGL", "rebuild_recovered",
                                           seed, args.max_epoch, res))
            print(f"rebuild    s{seed}: recall@20={res['metrics'][20]['recall']:.4f} "
                  f"ndcg@20={res['metrics'][20]['ndcg']:.4f} ({res['wall_s']:.0f}s)")

    fields = ["model", "side", "seed", "max_epoch",
              "recall@10", "ndcg@10", "recall@20", "ndcg@20",
              "recall@40", "ndcg@40", "hit@20", "prec@20", "wall_s"]
    with open(OUT, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {OUT}")

    import numpy as np

    for side in ("ref_fixed_recovered", "rebuild_recovered"):
        sel = [float(r["recall@20"]) for r in rows if r["side"] == side]
        if sel:
            print(f"{side}: recall@20 {np.mean(sel):.4f}±{np.std(sel):.4f}")


if __name__ == "__main__":
    main()
