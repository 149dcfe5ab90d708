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
            early_stop: int, pscale: int = 1) -> dict | None:
    """pscale: patience multiplier (1 = reference protocol; 0 = the
    model bundle's product default, e.g. x2 for HCCF)."""
    from hypergraph_diffusion_for_recommendation_tpu import cli

    argv = [f"--model={model}", f"--seed={seed}", f"--max_epoch={max_epoch}",
            f"--early_stopping_steps={early_stop}",
            f"--early_stop_smooth={smooth}",
            f"--early_stop_patience_scale={pscale}",
            *COMMON, *MODEL_FLAGS.get(model, []),
            "--data_dir", os.path.join(SANDBOX, "dataset"),
            "--output_dir", os.path.join(OUT_DIR, "runs"),
            "--item_ranking", "10,20,40", "--quiet"]
    t0 = time.time()
    try:
        result = cli.main(argv)
    except Exception as e:  # noqa: BLE001 — recorded per-run in the artifact
        print(f"  {model} s{seed} w{smooth} p{pscale}: FAILED {type(e).__name__}: {e}")
        return None
    m = result.final_metrics
    return dict(
        model=model, smooth=smooth, pscale=pscale, seed=seed,
        recall20=m[20]["recall"], ndcg20=m[20]["ndcg"],
        best_epoch=result.best_epoch, stop_epoch=len(result.history),
        wall_s=round(time.time() - t0, 1),
    )


CAMPAIGN_FINDINGS = [
    "## Findings (2026-08-21 campaign: HCCF,SHT x seeds 1-9 x windows 1,5)",
    "",
    "These conclusions were derived from that specific campaign's rows and",
    "its no-stop controls; they are reprinted verbatim, not recomputed from",
    "the table below.",
    "",
    "1. **Smoothing is a NEGATIVE result on this protocol** (kept as "
    "an opt-in knob): window 5 left every converged number and the "
    "collapsed seeds unchanged. The collapsed HCCF seed is not a "
    "spike-anchored stop — its recall genuinely dips for ~22 epochs "
    "after an early peak (longer than patience 15), so no smoothing "
    "window short of the trough helps.",
    "2. **HCCF's collapse IS a stopping artifact** — with stopping "
    "disabled, seed 8 recovers from 0.196 to 0.2948 (best epoch 73). "
    "The product fix is patience x2 (models/hccf.py bundle default), "
    "verified in the `pscale 0 (product)` arm below.",
    "3. **SHT's spread is NOT a stopping artifact** — its worst seed "
    "stays at 0.1008 even trained the full 80 epochs. Diagnosis from "
    "the loss CSVs: under this pinned config SHT's embedding norms "
    "decay to zero (reg_loss -> 0.0, rec_loss -> ln4, the zero-score "
    "BPR value) and recall rides the shrinking transient, which "
    "freezes once norms underflow; the seed decides the direction "
    "the table freezes in. The reference shows the same +-0.021-0.026 "
    "spread (ref_fixed, PARITY_RUNS.md) — matching dynamics, not a "
    "rebuild defect.",
    "",
    "No-early-stop controls (`runs_nostop/`, patience 100): "
    "HCCF seed 8 -> best_epoch 73, recall@20 0.2948 (recovers); "
    "SHT seed 9 -> best_epoch 32, recall@20 0.1008 (never recovers).",
]


def write_markdown(rows: list[dict], max_epoch: int, early_stop: int,
                   include_narrative: bool) -> None:
    """Data-derived table always; the fixed campaign narrative only when
    the aggregated rows actually contain the campaign it describes
    (HCCF+SHT, windows 1 and 5, >=9 seeds each) — otherwise a rerun with
    different models/seeds would present stale conclusions as if derived
    from the new table (round-4 advisor finding)."""
    import numpy as np

    models = sorted({r["model"] for r in rows})
    arms = sorted({(r["smooth"], r["pscale"]) for r in rows})
    lines = [
        "# Early-stopping rule A/B: smoothing and patience scale",
        "",
        "Same parity protocol as PARITY_RUNS.md (planted-cluster synthetic, "
        f"pinned flags, max_epoch {max_epoch}, patience {early_stop}); the "
        "variables are `--early_stop_smooth` (1 = reference-parity raw "
        "recall signal; W>1 = trailing moving average of width W for the "
        "STOP decision only — best-model selection stays on raw metrics) "
        "and `--early_stop_patience_scale` (1 = reference protocol; 0 = "
        "the model bundle's product default, x2 for HCCF). Reproduce: "
        "`python scripts/stopping_rule_ab.py`.",
        "",
    ]
    if include_narrative:
        lines += CAMPAIGN_FINDINGS + [""]
    lines += [
        "| Model | smooth | pscale | Recall@20 | NDCG@20 | min R@20 | "
        "stop epoch | wall s/run |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for m in models:
        for w, ps in arms:
            sel = [r for r in rows
                   if r["model"] == m and r["smooth"] == w and r["pscale"] == ps]
            if not sel:
                continue
            rec = np.array([r["recall20"] for r in sel])
            ndcg = np.array([r["ndcg20"] for r in sel])
            ep = np.array([r["stop_epoch"] for r in sel])
            ws = np.array([r["wall_s"] for r in sel])
            ps_label = "0 (product)" if ps == 0 else str(ps)
            lines.append(
                f"| {m} | {w} | {ps_label} | {rec.mean():.4f}±{rec.std():.4f} | "
                f"{ndcg.mean():.4f}±{ndcg.std():.4f} | {rec.min():.4f} | "
                f"{ep.mean():.1f} | {ws.mean():.0f} |"
            )
    lines += [
        "",
        "Raw rows: results.csv (rows predating the pscale column ran at "
        "pscale 1).",
    ]
    with open(MD_PATH, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {MD_PATH}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", type=str, default="HCCF,SHT")
    ap.add_argument("--seeds", type=str, default="1,2,3,4,5,6,7,8,9")
    ap.add_argument("--windows", type=str, default="1,5")
    ap.add_argument("--patience_scales", type=str, default="1",
                    help="comma list; 1 = reference protocol, 0 = the "
                         "model bundle's product default")
    ap.add_argument("--max_epoch", type=int, default=80)
    ap.add_argument("--early_stopping_steps", type=int, default=15)
    ap.add_argument("--report_only", action="store_true")
    args = ap.parse_args()

    ensure_sandbox()
    os.makedirs(OUT_DIR, exist_ok=True)
    fields = ["model", "smooth", "pscale", "seed", "recall20", "ndcg20",
              "best_epoch", "stop_epoch", "wall_s"]
    if not args.report_only:
        exists = os.path.exists(CSV_PATH)
        if exists:
            # migrate a pre-pscale CSV in place before appending — appending
            # 9-field rows under an old 8-column header would silently shift
            # every value one column in DictReader (round-4 advisor finding)
            with open(CSV_PATH, newline="") as f:
                old_rows = list(csv.DictReader(f))
            with open(CSV_PATH) as f:
                header = f.readline().strip().split(",")
            if header != fields:
                unknown = [h for h in header if h not in fields]
                if unknown:
                    raise SystemExit(
                        f"refusing to append: existing {CSV_PATH} header "
                        f"{header} has columns outside the current schema "
                        f"{fields}; move it aside and rerun")
                with open(CSV_PATH, "w", newline="") as f:
                    w = csv.DictWriter(f, fieldnames=fields)
                    w.writeheader()
                    for r in old_rows:
                        # rows predating the pscale column ran at scale 1
                        w.writerow({"pscale": 1, **r})
                print(f"migrated {CSV_PATH} from {len(header)}-col header "
                      f"to the current {len(fields)}-col schema")
        with open(CSV_PATH, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields, extrasaction="ignore")
            if not exists:
                w.writeheader()
            for model in args.models.split(","):
                for smooth in (int(x) for x in args.windows.split(",")):
                    for pscale in (int(x) for x in args.patience_scales.split(",")):
                        for seed in (int(s) for s in args.seeds.split(",")):
                            res = run_arm(model, seed, smooth, args.max_epoch,
                                          args.early_stopping_steps, pscale)
                            if res:
                                w.writerow(res)
                                f.flush()
                                print(f"{model} s{seed} w{smooth} p{pscale}: "
                                      f"recall@20={res['recall20']:.4f} "
                                      f"stop_ep={res['stop_epoch']} "
                                      f"({res['wall_s']}s)")

    # aggregate over all recorded rows (rows predating the pscale
    # column ran under the then-default scale 1)
    with open(CSV_PATH) as f:
        all_rows = [
            {**{"pscale": 1},
             **{k: (float(v) if k in ("recall20", "ndcg20", "wall_s") else
                    int(v) if k in ("smooth", "pscale", "seed", "best_epoch",
                                    "stop_epoch")
                    else v)
                for k, v in r.items() if v is not None}}
            for r in csv.DictReader(f)
        ]
    campaign = (
        {"HCCF", "SHT"} <= {r["model"] for r in all_rows}
        and {1, 5} <= {r["smooth"] for r in all_rows}
        and all(
            len({r["seed"] for r in all_rows
                 if r["model"] == m and r["smooth"] == w}) >= 9
            for m in ("HCCF", "SHT") for w in (1, 5))
    )
    write_markdown(all_rows, args.max_epoch, args.early_stopping_steps,
                   include_narrative=campaign)


if __name__ == "__main__":
    main()
