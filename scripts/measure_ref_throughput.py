"""Measure the REFERENCE's training throughput on bench-shaped data (VERDICT r4 weak #5).

bench.py's `vs_baseline` was a ratio against an ESTIMATED 10k examples/sec.
The reference runs in this environment via the parity sandbox shims, so the
anchor can be measured: run the reference's own KHGRec (and LightGCN)
epoch loop on a dataset with the EXACT bench shape (1890 users x 17632
items, mean degree 49, seed 7, with KG — the same synthetic_dataset call
bench.py makes) and read its per-epoch train seconds from the
train_performance.csv it writes (base/main_recommender.py:191-214).

Writes parity/baseline_throughput.json:
  {"khgrec_cpu_examples_per_sec": ..., "lightgcn_cpu_examples_per_sec": ...,
   "hardware": "cpu", "n_epochs_timed": ..., ...}
which bench.py reads to anchor vs_baseline with baseline_estimated=false.

Caveat (documented in the JSON): the reference targets CUDA; the only
hardware it runs on here is CPU (torch 2.x, all cores). A GPU would be
faster — the estimated 10k ex/s figure for a single-GPU run is kept in
the JSON for context, and bench.py reports the measured-CPU multiple
separately from the GPU-estimate multiple.

Usage: python scripts/measure_ref_throughput.py [--models KHGRec,LightGCN]
       [--max_epoch 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SANDBOX = os.path.join(ROOT, "parity", "sandbox_bench")
REFERENCE = "/root/reference/HD_SELFRec"
OUT_JSON = os.path.join(ROOT, "parity", "baseline_throughput.json")

# the bench dataset recipe — MUST mirror bench.py's synthetic_dataset call
BENCH_DATASET = dict(n_users=1890, n_items=17632, mean_degree=49.0, seed=7,
                     with_kg=True)
# the bench flags both sides honor (bench.py cfg)
FLAGS = ["--dataset=lastfm", "--batch_size=2048", "--batch_size_kg=8192",
         "--lrate=0.001", "--hyper_dim=128", "--relation_dim=32",
         "--temp=1.0", "--cl_rate=0.01", "--drop_rate=0.2",
         "--early_stopping_steps=100"]


def ensure_bench_sandbox() -> None:
    """Sandbox with the reference code symlinked and the BENCH-shaped
    dataset (same layout logic as run_parity.ensure_sandbox, different
    dataset)."""
    os.makedirs(os.path.join(SANDBOX, "dataset", "lastfm"), exist_ok=True)
    for d in ("results", "log"):
        os.makedirs(os.path.join(SANDBOX, d), exist_ok=True)
    for f in ("main.py", "SELFRec.py", "base", "data", "util", "dataset_util.py"):
        dst = os.path.join(SANDBOX, f)
        if not os.path.lexists(dst):
            os.symlink(os.path.join(REFERENCE, f), dst)
    for sub in ("conf", "model/graph", "model/layers"):
        os.makedirs(os.path.join(SANDBOX, sub), exist_ok=True)
        for name in os.listdir(os.path.join(REFERENCE, sub)):
            dst = os.path.join(SANDBOX, sub, name)
            if not os.path.lexists(dst):
                os.symlink(os.path.join(REFERENCE, sub, name), dst)
    init = os.path.join(REFERENCE, "model", "__init__.py")
    dst = os.path.join(SANDBOX, "model", "__init__.py")
    if os.path.exists(init) and not os.path.lexists(dst):
        os.symlink(init, dst)

    ddir = os.path.join(SANDBOX, "dataset", "lastfm")
    if not os.path.exists(os.path.join(ddir, "train.txt")):
        from hypergraph_diffusion_for_recommendation_tpu.data.io import (
            write_interactions, write_kg,
        )
        from hypergraph_diffusion_for_recommendation_tpu.data.synthetic import (
            synthetic_dataset,
        )

        train, test, kg = synthetic_dataset(**BENCH_DATASET)
        write_interactions(os.path.join(ddir, "train.txt"), train)
        write_interactions(os.path.join(ddir, "test.txt"), test)
        write_kg(os.path.join(ddir, "lastfm.kg"), kg.to_numpy())
        print(f"bench dataset written: {len(train)} train / {len(test)} test")


def run_and_time(model: str, max_epoch: int) -> dict | None:
    res_dir = os.path.join(SANDBOX, "results", model)
    if os.path.isdir(res_dir):
        shutil.rmtree(res_dir)
    argv = [sys.executable, os.path.join(ROOT, "scripts", "parity_ref_runner.py"),
            f"--model={model}", "--seed=1", f"--max_epoch={max_epoch}",
            "--emit_epoch_times", *FLAGS]
    t0 = time.time()
    proc = subprocess.run(argv, cwd=SANDBOX, capture_output=True, text=True,
                          timeout=14000, check=False)
    wall = time.time() - t0
    log_path = os.path.join(ROOT, "parity", "logs", f"bench_shape_{model}.log")
    os.makedirs(os.path.dirname(log_path), exist_ok=True)
    with open(log_path, "w") as f:
        f.write(proc.stdout + "\n--- stderr ---\n" + proc.stderr)
    if proc.returncode != 0:
        print(f"{model}: FAILED rc={proc.returncode} (log: {log_path})")
        return None
    # the runner's install_epoch_timer prints the reference's OWN
    # per-epoch train seconds (the value it feeds its performance CSV)
    train_times = [float(line.split()[2]) for line in proc.stdout.splitlines()
                   if line.startswith("EPOCH_TRAIN_TIME ")]
    if not train_times:
        print(f"{model}: no EPOCH_TRAIN_TIME lines; using wall/epoch "
              f"(upper bound incl. eval)")
        train_times = [wall / max_epoch]
    # examples per epoch exactly as the reference batches them
    # (n_cf_train // bs + 1 batches of bs — KHGRec.py:110)
    ddir = os.path.join(SANDBOX, "dataset", "lastfm")
    n_train = sum(1 for _ in open(os.path.join(ddir, "train.txt"))) - 1
    bs = 2048
    n_batches = n_train // bs + 1
    examples = n_batches * bs
    # steady per-epoch train time: drop the first epoch (warmup/alloc)
    steady = train_times[1:] or train_times
    t_epoch = sum(steady) / len(steady)
    eps = examples / t_epoch
    print(f"{model}: {len(train_times)} epochs, steady train {t_epoch:.1f}s "
          f"/epoch -> {eps:,.0f} examples/sec (wall {wall:.0f}s)")
    return dict(examples_per_sec=round(eps, 1), epoch_s=round(t_epoch, 2),
                n_epochs_timed=len(steady), wall_s=round(wall, 1),
                n_train=n_train, n_batches=n_batches)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="KHGRec,LightGCN")
    ap.add_argument("--max_epoch", type=int, default=3)
    args = ap.parse_args()

    ensure_bench_sandbox()
    out = {
        "hardware": "cpu",
        "note": "reference measured via the parity sandbox shims on CPU "
                "(its CUDA path shimmed; torch uses all host cores). The "
                "reference targets a single GPU, for which no measurement "
                "is possible here — the 10k ex/s single-GPU ESTIMATE is "
                "retained separately for context.",
        "gpu_estimate_examples_per_sec": 10000.0,
        "dataset": BENCH_DATASET,
        "flags": FLAGS,
    }
    for model in args.models.split(","):
        res = run_and_time(model, args.max_epoch)
        if res:
            out[f"{model.lower()}_cpu"] = res
    with open(OUT_JSON, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT_JSON}")


if __name__ == "__main__":
    main()
