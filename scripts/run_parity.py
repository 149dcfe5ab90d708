"""Rebuild-vs-reference metric parity on shared synthetic data (VERDICT r2 #1).

Runs the REFERENCE's own torch code (CPU, via scripts/parity_ref_runner.py
shims) and THIS framework on byte-identical train/test/kg files with
identical hyperparameter flags, over >=3 seeds, and writes

  parity/parity_results.csv  — one row per (model, side, seed)
  PARITY_RUNS.md             — aggregated table: mean +/- std Recall@20 /
                               NDCG@20 per model per side, delta, and the
                               exact error for every blocked model.

The shared dataset is planted-cluster synthetic (data/synthetic.py),
written in the reference's file layout (header line + `user\titem` TSV,
`h\tr\tt` KG TSV — data/loader.py:24-78) under parity/sandbox/dataset/.

Usage:
  python scripts/run_parity.py --side both --seeds 1,2,3 --max_epoch 60
  python scripts/run_parity.py --side ref    # reference only (CPU, slow)
  python scripts/run_parity.py --side rebuild
"""

from __future__ import annotations

import argparse
import csv
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SANDBOX = os.path.join(ROOT, "parity", "sandbox")
REference = "/root/reference/HD_SELFRec"
OUT_DIR = os.path.join(ROOT, "parity")
CSV_PATH = os.path.join(OUT_DIR, "parity_results.csv")
MD_PATH = os.path.join(ROOT, "PARITY_RUNS.md")

# Shared dataset recipe (deterministic; both sides read the same files).
DATASET = dict(n_users=800, n_items=600, n_clusters=8, mean_degree=30.0,
               seed=11, with_kg=True)

# Flags passed IDENTICALLY to reference main.py and the rebuild CLI.
# Every knob the two sides would otherwise default DIFFERENTLY is pinned
# explicitly, because the reference's effective defaults are a
# conf/kwargs duality (SURVEY 2.10: models read most knobs from the
# argparse kwargs, whose defaults — temp=10, hyper_dim=32, reg=0.01 —
# disagree with the conf files that MODEL_DEFAULTS mirrors). Both sides
# honor all of these flags, so the table compares IMPLEMENTATIONS under
# one effective config, not two default sets. HCCF's temp/hyper.size/
# dropout/leaky come from its conf file on the reference side
# (HCCF.py:52-55); the pins below equal those conf values.
COMMON = ["--dataset=lastfm", "--batch_size=2048", "--lrate=0.001"]
# Rebuild-only pins that hold the rebuild to the REFERENCE'S stopping
# SIGNAL: the reference has no smoothed stopping, so parity rows use the
# raw recall series even if smoothing ever becomes a model default.
# Patience SCALE is deliberately NOT pinned — per the accepted round-4
# protocol (VERDICT r3 #3), the rebuild runs with its product patience
# defaults (x2 for self-att bundles and HCCF, whose measured recall
# troughs outlast patience-15; results/stopping_rule_ab/RESULTS.md).
# The asymmetry this creates (rebuild at patience 30 vs reference at 15
# for those models) is closed by the `ref_fixed_p2` control side below:
# the reference rerun at the SAME effective patience the rebuild gets,
# so every headline row has a same-stopping-budget comparison column
# (round-4 advisor medium / VERDICT r4 weak #3).
REBUILD_PINS = ["--early_stop_smooth=1"]
# Product patience multipliers, kept in sync with the model bundles
# (models/hccf.py:121 bundle default; models/khgrec.py:405 for the
# use_self_att family — HGNN/HD2). Models absent here run at scale 1,
# where the protocol is already symmetric.
PRODUCT_PATIENCE_SCALE = {"HCCF": 2, "HGNN": 2, "HD2": 2}
MODEL_FLAGS: dict[str, list[str]] = {
    "LightGCN": ["--reg=0.1", "--weight_decay=5e-6"],
    "HCCF": ["--reg=0.01", "--n_layers=2", "--hyper_dim=128",
             "--drop_rate=0.3", "--p=0.5", "--temp=1.0", "--cl_rate=0.01"],
    # the reference hard-codes aug_type=0 whatever the flag says (SGL.py:50)
    "SGL": ["--reg=0.1", "--cl_rate=0.01", "--temp=0.2", "--drop_rate=0.1",
            "--aug_type=0"],
    "SHT": ["--reg=0.01", "--hyper_dim=128", "--hyperedge_num=128",
            "--cl_rate=0.001", "--temp=0.2", "--drop_rate=0.2"],
    "DHCF": ["--reg=0.01", "--n_layers=2"],
    "KGAT": ["--batch_size_kg=4096", "--reg=0.01", "--reg_kg=0.01"],
    "KHGRec": ["--batch_size_kg=4096", "--hyper_dim=64", "--relation_dim=32",
               "--temp=1.0", "--cl_rate=0.01", "--drop_rate=0.2", "--p=0.3",
               "--reg=0.01", "--reg_kg=0.01", "--n_layers=2"],
    "HGNN": ["--batch_size_kg=4096", "--hyper_dim=64", "--relation_dim=32",
             "--temp=1.0", "--cl_rate=0.01", "--drop_rate=0.2", "--p=0.3",
             "--reg=0.01", "--reg_kg=0.01", "--n_layers=2"],
    # the reference's wavelet weight matrices are sized from conf
    # embedding.size=32 while features take kwargs hyper_dim — the model
    # only runs with hyper_dim == 32 (shape error otherwise), so that is
    # the pinned capacity for both sides.
    "HGNN_HD3": ["--hyper_dim=32", "--cl_rate=1e-5", "--temp=0.2",
                 "--drop_rate=0.2", "--p=0.3", "--reg=0.1",
                 "--weight_decay=5e-6"],
    "MF": ["--reg=0.1"],
}

# Models that cannot run on the reference side, with the exact blocker —
# verified by invocation in this environment (see PARITY_RUNS.md).
REF_BLOCKED = {
    "MF": "registry-only: no model/graph/MF.py exists at reference HEAD "
          "(main.py:99 advertises it; conf/MF.conf exists)",
    "HD": "model/layers/layers2/EquivSetGNN2.py:148 "
          "`torch.nonzero(hypergraph > 0)` on a sparse tensor: "
          "NotImplementedError aten::gt.Scalar for SparseCPU backend "
          "(torch 1.10 and 2.13 alike — the committed code path needs a "
          "dense hypergraph it is never given)",
    "HGNN_HD": "HGNN_HD.py:441 calls EquivSetGNN(num_features, args, "
               "dense_hypergraph, data) but the shared layer requires "
               "(.., ncount, mcount): TypeError missing 2 required "
               "positional arguments (SURVEY 7.4 constructor mismatch)",
    "HGCN": "base/recommender.py:110 calls self.train(load_pretrained=False) "
            "but HGCN.train() takes no such kwarg: TypeError",
}


def ensure_sandbox() -> None:
    """Idempotently build the sandbox: symlink the reference code,
    restore the broken --model=HGNN entry, generate the shared dataset."""
    os.makedirs(os.path.join(SANDBOX, "dataset", "lastfm"), exist_ok=True)
    for d in ("results", "log"):
        os.makedirs(os.path.join(SANDBOX, d), exist_ok=True)
    for f in ("main.py", "SELFRec.py", "base", "data", "util", "dataset_util.py"):
        dst = os.path.join(SANDBOX, f)
        if not os.path.lexists(dst):
            os.symlink(os.path.join(REference, f), dst)
    # conf/ and model/ are real dirs of per-file symlinks so the sandbox
    # can carry the HGNN shim entries the reference lost (SURVEY 7.4).
    for sub in ("conf", "model/graph", "model/layers"):
        os.makedirs(os.path.join(SANDBOX, sub), exist_ok=True)
        for name in os.listdir(os.path.join(REference, sub)):
            dst = os.path.join(SANDBOX, sub, name)
            if not os.path.lexists(dst):
                os.symlink(os.path.join(REference, sub, name), dst)
    init = os.path.join(REference, "model", "__init__.py")
    dst = os.path.join(SANDBOX, "model", "__init__.py")
    if os.path.exists(init) and not os.path.lexists(dst):
        os.symlink(init, dst)
    hgnn_py = os.path.join(SANDBOX, "model", "graph", "HGNN.py")
    if not os.path.exists(hgnn_py):
        with open(hgnn_py, "w") as f:
            f.write(
                "# Sandbox shim: --model=HGNN is broken at reference HEAD "
                "(no model/graph/HGNN.py;\n# the class lives in HGNN_cp.py "
                "— SURVEY 7.4). This restores the published name.\n"
                "from model.graph.HGNN_cp import HGNN\n"
            )
    hgnn_conf = os.path.join(SANDBOX, "conf", "HGNN.conf")
    if not os.path.exists(hgnn_conf):
        with open(os.path.join(REference, "conf", "KHGRec.conf")) as f:
            conf = f.read().replace("model.name=KHGRec", "model.name=HGNN")
        with open(hgnn_conf, "w") as f:
            f.write(conf)

    ddir = os.path.join(SANDBOX, "dataset", "lastfm")
    if not os.path.exists(os.path.join(ddir, "train.txt")):
        from hypergraph_diffusion_for_recommendation_tpu.data.io import (
            write_interactions, write_kg,
        )
        from hypergraph_diffusion_for_recommendation_tpu.data.synthetic import (
            synthetic_dataset,
        )

        train, test, kg = synthetic_dataset(**DATASET)
        write_interactions(os.path.join(ddir, "train.txt"), train)
        write_interactions(os.path.join(ddir, "test.txt"), test)
        write_kg(os.path.join(ddir, "lastfm.kg"), kg.to_numpy())
        # the rebuild's default KG filename (cli.load_dataset)
        write_kg(os.path.join(ddir, "processed_lastfm.kg"), kg.to_numpy())
        print(f"dataset written: {len(train)} train / {len(test)} test pairs")


TOPK_RE = re.compile(
    r"Top (\d+)\nHit Ratio:([\d.eE+-]+)\nPrecision:([\d.eE+-]+)\n"
    r"Recall:([\d.eE+-]+)\nNDCG:([\d.eE+-]+)"
)


def run_reference(model: str, seed: int, max_epoch: int, early_stop: int,
                  log_dir: str, fix_topk: bool = False,
                  log_tag: str | None = None) -> dict | None:
    argv = [sys.executable, os.path.join(ROOT, "scripts", "parity_ref_runner.py"),
            f"--model={model}", f"--seed={seed}", f"--max_epoch={max_epoch}",
            f"--early_stopping_steps={early_stop}", *COMMON, *MODEL_FLAGS.get(model, [])]
    if fix_topk:
        # corrected top-K (the fork's find_k_largest duplicates first-K
        # ids — see parity_ref_runner.install_fixed_topk)
        argv.append("--fix_topk")
    t0 = time.time()
    proc = subprocess.run(
        argv, cwd=SANDBOX, capture_output=True, text=True,
        timeout=3600, check=False,
    )
    wall = time.time() - t0
    tag = log_tag or ("ref_fixed" if fix_topk else "ref")
    log_path = os.path.join(log_dir, f"{tag}_{model}_s{seed}.log")
    with open(log_path, "w") as f:
        f.write(proc.stdout + "\n--- stderr ---\n" + proc.stderr)
    if proc.returncode != 0:
        print(f"  REF {model} seed {seed}: FAILED rc={proc.returncode} (log: {log_path})")
        return None
    rows = {}
    for k, hit, prec, rec, ndcg in TOPK_RE.findall(proc.stdout):
        rows[int(k)] = dict(hit_ratio=float(hit), precision=float(prec),
                            recall=float(rec), ndcg=float(ndcg))
    if not rows:
        print(f"  REF {model} seed {seed}: no metrics parsed (log: {log_path})")
        return None
    return dict(metrics=rows, wall_s=wall)


def run_rebuild(model: str, seed: int, max_epoch: int, early_stop: int,
                sampler: str = "redraw") -> dict | None:
    from hypergraph_diffusion_for_recommendation_tpu import cli

    argv = [f"--model={model}", f"--seed={seed}", f"--max_epoch={max_epoch}",
            f"--early_stopping_steps={early_stop}", *COMMON, *REBUILD_PINS,
            *MODEL_FLAGS.get(model, []),
            f"--sampler={sampler}",
            "--data_dir", os.path.join(SANDBOX, "dataset"),
            "--output_dir", os.path.join(OUT_DIR, "rebuild_results"),
            "--item_ranking", "10,20,40", "--quiet"]
    t0 = time.time()
    try:
        result = cli.main(argv)
    except Exception as e:  # noqa: BLE001 — recorded per-model in the artifact
        print(f"  REBUILD {model} seed {seed}: FAILED {type(e).__name__}: {e}")
        return None
    wall = time.time() - t0
    return dict(metrics=result.final_metrics, wall_s=wall)


def append_rows(rows: list[dict]) -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    exists = os.path.exists(CSV_PATH)
    fields = ["model", "side", "seed", "max_epoch",
              "recall@10", "ndcg@10", "recall@20", "ndcg@20",
              "recall@40", "ndcg@40", "hit@20", "prec@20", "wall_s"]
    with open(CSV_PATH, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        if not exists:
            w.writeheader()
        for r in rows:
            w.writerow(r)


def flatten(model: str, side: str, seed: int, max_epoch: int, res: dict) -> dict:
    m = res["metrics"]
    return {
        "model": model, "side": side, "seed": seed, "max_epoch": max_epoch,
        "recall@10": m[10]["recall"], "ndcg@10": m[10]["ndcg"],
        "recall@20": m[20]["recall"], "ndcg@20": m[20]["ndcg"],
        "recall@40": m.get(40, {}).get("recall", ""),
        "ndcg@40": m.get(40, {}).get("ndcg", ""),
        "hit@20": m[20]["hit_ratio"], "prec@20": m[20]["precision"],
        "wall_s": round(res["wall_s"], 1),
    }


def write_markdown(max_epoch: int, early_stop: int) -> None:
    import numpy as np

    with open(CSV_PATH) as f:
        rows = list(csv.DictReader(f))
    models = sorted({r["model"] for r in rows})

    def agg(model, side, key):
        vals = [float(r[key]) for r in rows if r["model"] == model and r["side"] == side]
        return (np.mean(vals), np.std(vals), len(vals)) if vals else (None, None, 0)

    def fmt(t, prec=4):
        return f"{t[0]:.{prec}f}±{t[1]:.{prec}f}" if t[0] is not None else "—"

    lines = [
        "# Rebuild-vs-reference metric parity (VERDICT r2 #1 / r3 #1)",
        "",
        "The reference's own torch code, run on CPU in this environment "
        "(numba/CUDA/torch_scatter shims — `scripts/parity_ref_runner.py`), "
        "against this framework on BYTE-IDENTICAL data files and identical "
        "hyperparameter flags. Dataset: planted-cluster synthetic "
        f"({DATASET['n_users']} users x {DATASET['n_items']} items, "
        f"mean degree {DATASET['mean_degree']:.0f}, seed {DATASET['seed']}), "
        "written in the reference's file layout; 75/25 split. "
        f"max_epoch {max_epoch}, early stopping {early_stop}, metric = "
        "converged (best-epoch) test-set value.",
        "",
        "Flags: `" + " ".join(COMMON) + "` (+ per-model: "
        + "; ".join(f"{m}: {' '.join(v)}" for m, v in MODEL_FLAGS.items() if v)
        + "). Reproduce: `python scripts/run_parity.py --side both` "
        "(+ `--side ref_fixed` / `--side rebuild_exact` for the control "
        "columns below).",
        "",
        "## The reference's top-K duplication defect (round-4 root cause)",
        "",
        "This fork's `find_k_largest` (`util/algorithm.py:143-173`) seeds "
        "its candidate list with item ids 0..K-1 and then re-scans ALL "
        "candidates from index 0, so any of the first K ids that survives "
        "in the final top-K is inserted a SECOND time: its returned "
        "rankings contain duplicate ids (measured ~2.4 duplicate slots per "
        "top-40 on random scores at this 600-item catalog; 8.9 on converged "
        "LightGCN scores; ~0.04 at a real 17k-item catalog, which is why "
        "it is invisible upstream). Consequences, measured by feeding ONE "
        "set of converged rebuild embeddings through both eval stacks "
        "(`scripts/cross_eval_check.py`):",
        "",
        "- reference-eval Recall@20 deflates by ~0.041 (duplicates crowd "
        "real candidates out of the window); NDCG@20 shifts -0.002.",
        "- the defective recall trajectory also perturbs recall-based "
        "early stopping: defective runs can train several times longer "
        "(HCCF seed 2: stop at epoch 80 vs 31 corrected), and late "
        "training keeps improving NDCG — the source of the apparent "
        "reference NDCG advantage in the round-3 table.",
        "- the rebuild's on-device eval is bit-identical to a correct "
        "stable top-K on the same scores (asserted in the script).",
        "",
        "`ref_fixed` columns rerun the reference with a corrected stable "
        "top-K (`parity_ref_runner.py --fix_topk`); everything else "
        "(training code, seeds, data) is untouched.",
        "",
        "| Model | ref R@20 (defective eval) | ref_fixed R@20 | rebuild "
        "R@20 | Δ(rebuild−ref_fixed) | ref N@20 | ref_fixed N@20 | rebuild "
        "N@20 | Δ |",
        "|---|---|---|---|---|---|---|---|---|",
    ]

    for m in models:
        rr = agg(m, "ref", "recall@20")
        fr = agg(m, "ref_fixed", "recall@20")
        br = agg(m, "rebuild", "recall@20")
        rn = agg(m, "ref", "ndcg@20")
        fn_ = agg(m, "ref_fixed", "ndcg@20")
        bn = agg(m, "rebuild", "ndcg@20")
        base = fr if fr[0] is not None else rr
        base_n = fn_ if fn_[0] is not None else rn
        d_rec = (f"{br[0] - base[0]:+.4f}"
                 if base[0] is not None and br[0] is not None else "—")
        d_ndcg = (f"{bn[0] - base_n[0]:+.4f}"
                  if base_n[0] is not None and bn[0] is not None else "—")
        lines.append(
            f"| {m} | {fmt(rr)} | {fmt(fr)} | {fmt(br)} | {d_rec} | "
            f"{fmt(rn)} | {fmt(fn_)} | {fmt(bn)} | {d_ndcg} |"
        )

    p2_models = [m for m in models
                 if agg(m, "ref_fixed_p2", "recall@20")[0] is not None]
    if p2_models:
        lines += [
            "",
            "## Stopping-protocol symmetry control (round-4 weak #3)",
            "",
            "The rebuild's product defaults give HCCF and the self-att "
            "bundle (HGNN) patience x2 — an asymmetric epoch budget vs "
            f"reference rows at patience {early_stop}. `ref_fixed_p2` "
            "reruns the corrected reference with the SAME x2 patience "
            f"(={2 * early_stop}), so this table compares both sides under "
            "one stopping budget. Reproduce: "
            "`python scripts/run_parity.py --side ref_fixed_p2 "
            "--models HCCF,HGNN`.",
            "",
            "| Model | ref_fixed (patience "
            f"{early_stop}) R@20 | ref_fixed_p2 (patience {2 * early_stop}) "
            "R@20 | rebuild (product, same budget) R@20 | "
            "Δ(rebuild−ref_fixed_p2) | ref_fixed_p2 N@20 | rebuild N@20 |",
            "|---|---|---|---|---|---|---|",
        ]
        for m in p2_models:
            fr = agg(m, "ref_fixed", "recall@20")
            p2 = agg(m, "ref_fixed_p2", "recall@20")
            br = agg(m, "rebuild", "recall@20")
            p2n = agg(m, "ref_fixed_p2", "ndcg@20")
            bn = agg(m, "rebuild", "ndcg@20")
            d = (f"{br[0] - p2[0]:+.4f}"
                 if br[0] is not None and p2[0] is not None else "—")
            lines.append(
                f"| {m} | {fmt(fr)} | {fmt(p2)} | {fmt(br)} | {d} | "
                f"{fmt(p2n)} | {fmt(bn)} |")

    lines += [
        "",
        "## Exact-rejection sampler A/B (round-3 hypothesis: REFUTED)",
        "",
        "Round 3 attributed the recall/NDCG pattern to the rebuild's "
        "fixed-round negative redraw. Direct test: `--sampler=exact` runs "
        "the rebuild with a host-side exact rejection loop (the "
        "reference's `util/sampler.py:252-257` semantics). The deltas are "
        "within seed noise — the sampler was never the mechanism (the "
        "redraw's residual collision probability is (deg/I)^8 ≈ 4e-11 "
        "here, and a 225k-draw audit found zero in-history negatives).",
        "",
        "| Model | rebuild (redraw) R@20 | rebuild (exact) R@20 | rebuild "
        "(redraw) N@20 | rebuild (exact) N@20 |",
        "|---|---|---|---|---|",
    ]
    for m in models:
        er = agg(m, "rebuild_exact", "recall@20")
        if er[0] is None:
            continue
        br = agg(m, "rebuild", "recall@20")
        bn = agg(m, "rebuild", "ndcg@20")
        en = agg(m, "rebuild_exact", "ndcg@20")
        lines.append(f"| {m} | {fmt(br)} | {fmt(er)} | {fmt(bn)} | {fmt(en)} |")

    lines += [
        "",
        "Outlier notes:",
        "",
        "- **KHGRec**: the reference implementation collapses under this "
        "pinned config while the rebuild trains stably to 0.368 on the same "
        "files/flags. Measured in the reference's OWN kwargs-default regime "
        "too (hyper_dim=32/temp=10, corrected top-K — "
        "`scripts/khgrec_kwargs_check.py`, rows in `parity/khgrec_kwargs"
        ".csv`): ref_fixed 0.2963±0.0639 (seeds 0.345/0.206/0.338 — "
        "unstable) vs rebuild 0.3623±0.0046 — the rebuild beats the "
        "reference's BEST seed in the reference's best regime, with ~14x "
        "less seed variance. Known reference defects involved: the SSL "
        "term contrasts a view with ITSELF "
        "(`contrastLoss(embeds2[n_users:], embeds2[n_users:], ...)`, "
        "KHGRec.py:370-371 — fixed deliberately in the rebuild, SURVEY "
        "7.4) and the per-batch CPU sparse-softmax attention refresh.",
        "- **SGL**: BOTH implementations collapse to ~0.035 under the pinned "
        "(cl_rate 0.01, temp 0.2, node-dropout) config — agreement on a "
        "pathological config is itself strong parity evidence — AND both "
        "recover together with CL weakened (the reference's kwargs-default "
        "temp=10): ref_fixed 0.1804±0.0038 vs rebuild 0.1833±0.0046 "
        "recall@20 over the same 3 seeds (`scripts/sgl_recovered_check.py`, "
        "rows in `parity/sgl_recovered.csv`) — the implementations match "
        "in BOTH regimes.",
        "- **HCCF / SHT** show large reference-side seed variance under "
        "the corrected eval (HCCF ref_fixed ±0.039, SHT ±0.027 — vs the "
        "rebuild's ±0.003) — their recall trajectories plateau long "
        "before a late climb, so patience-15 stopping is seed-lottery; "
        "the rebuild's on-device epoch is deterministic enough to sit "
        "consistently at the top of the reference's seed range.",
        "- **SHT reg semantics (round-5 product fix)**: the reference's "
        "SHT is the only model in its codebase regularising the FULL "
        "parameter tables every step (calcRegLoss, SHT.py:234-239) "
        "instead of batch rows (its own util/loss_torch.py convention); "
        "under the pinned reg=0.01 this collapses embedding norms on "
        "some seeds in BOTH implementations (the ±0.014-0.021 lottery). "
        "Rebuild rows run the product default --sht_reg=batch "
        "(0.2027±0.0018 over 9 seeds vs ref_fixed full-reg 0.133±0.021 "
        "— above the reference's best seed); --sht_reg=full reproduces "
        "the reference semantics exactly (0.1345±0.0142). Full A/B: "
        "results/sht_reg_ab/RESULTS.md.",
        "",
        "## Reference-side blocked models (exact errors, verified by invocation)",
        "",
    ]
    for m, why in REF_BLOCKED.items():
        lines.append(f"- **{m}** — {why}")
    lines += [
        "",
        "Raw per-seed rows: `parity/parity_results.csv`; per-run reference "
        "stdout under `parity/logs/`. The rebuild rows were produced on the "
        "session's single TPU v5e chip; reference rows on CPU (its CUDA "
        "path shimmed to CPU — same math, torch 2.13).",
        "",
        "Seed-variance note: both sides use the SAME seed list but their "
        "RNG streams are framework-specific (torch vs JAX), so per-seed "
        "values are not expected to match pairwise — only the converged "
        "distributions (mean ± std) are comparable.",
        "",
        "Stopping-protocol note: rebuild rows run under the product's "
        "stopping defaults at generation time (the raw reference stopping "
        "SIGNAL is pinned via --early_stop_smooth=1; patience SCALE "
        "follows the model bundle — x2 for self-att models per the "
        "round-3 HGNN root cause, and x2 for HCCF as of round 4; HCCF "
        "rebuild rows were regenerated under that default in round 5). "
        "For the x2 models the `ref_fixed_p2` section above reruns the "
        "reference at the SAME patience, so every headline comparison "
        "has a same-budget column; full stopping A/B and no-stop "
        "controls in results/stopping_rule_ab/RESULTS.md.",
    ]
    with open(MD_PATH, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {MD_PATH}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--side",
                    choices=["ref", "rebuild", "both", "report", "ref_fixed",
                             "rebuild_exact", "ref_fixed_p2"],
                    default="both")
    ap.add_argument("--models", type=str,
                    default=",".join(MODEL_FLAGS))
    ap.add_argument("--seeds", type=str, default="1,2,3")
    # 80 matches the committed ref rows' budget (CSV max_epoch column);
    # KHGRec/HGNN converge at epoch ~60-80, so a 60-epoch budget
    # truncates them (round-4 lesson: protocol knobs live in the CSV)
    ap.add_argument("--max_epoch", type=int, default=80)
    ap.add_argument("--early_stopping_steps", type=int, default=15)
    args = ap.parse_args()

    ensure_sandbox()
    models = [m for m in args.models.split(",") if m]
    seeds = [int(s) for s in args.seeds.split(",")]
    log_dir = os.path.join(OUT_DIR, "logs")
    os.makedirs(log_dir, exist_ok=True)

    if args.side in ("ref", "both", "ref_fixed", "ref_fixed_p2"):
        fix = args.side in ("ref_fixed", "ref_fixed_p2")
        tag = args.side if args.side in ("ref_fixed", "ref_fixed_p2") else "ref"
        for model in models:
            if model in REF_BLOCKED:
                print(f"REF {model}: blocked — {REF_BLOCKED[model][:80]}")
                continue
            patience = args.early_stopping_steps
            if args.side == "ref_fixed_p2":
                scale = PRODUCT_PATIENCE_SCALE.get(model, 1)
                if scale == 1:
                    print(f"REF_FIXED_P2 {model}: product scale is 1 — "
                          "protocol already symmetric, skipping")
                    continue
                patience *= scale
            for seed in seeds:
                res = run_reference(model, seed, args.max_epoch,
                                    patience, log_dir,
                                    fix_topk=fix, log_tag=tag)
                if res:
                    append_rows([flatten(model, tag, seed, args.max_epoch, res)])
                    print(f"{tag.upper()} {model} seed {seed}: recall@20="
                          f"{res['metrics'][20]['recall']:.4f} "
                          f"({res['wall_s']:.0f}s)")
    if args.side in ("rebuild", "both", "rebuild_exact"):
        sampler = "exact" if args.side == "rebuild_exact" else "redraw"
        tag = "rebuild_exact" if args.side == "rebuild_exact" else "rebuild"
        for model in models:
            for seed in seeds:
                res = run_rebuild(model, seed, args.max_epoch,
                                  args.early_stopping_steps, sampler=sampler)
                if res:
                    append_rows([flatten(model, tag, seed, args.max_epoch, res)])
                    print(f"{tag.upper()} {model} seed {seed}: recall@20="
                          f"{res['metrics'][20]['recall']:.4f} "
                          f"({res['wall_s']:.0f}s)")
    write_markdown(args.max_epoch, args.early_stopping_steps)


if __name__ == "__main__":
    main()
