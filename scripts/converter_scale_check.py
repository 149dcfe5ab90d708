"""Converter scale proof (VERDICT r2 #8): synthesize a realistic 1M-row
MovieLens-1M-format raw dump, stream-convert it (atomic files ->
min-rating filter -> iterative k-core -> ratings.txt), split
train/test in the reference file layout, and train 2 epochs through the
production CLI.

  python scripts/converter_scale_check.py [--rows 1000000] [--skip_train]

Prints one PASS line with stage timings and resulting shapes.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

WORK = os.path.join(ROOT, "parity", "converter_scale")


def synthesize_ml1m(raw_dir: str, n_rows: int, n_users: int = 6040,
                    n_items: int = 3952, seed: int = 3) -> None:
    """ML-1M-shaped raw dump: `::`-separated ratings/movies/users files.
    Zipf item popularity + lognormal user activity, integer ratings 1-5
    biased high (real ML-1M mean is ~3.6), unix-ish timestamps."""
    rng = np.random.default_rng(seed)
    os.makedirs(raw_dir, exist_ok=True)

    act = rng.lognormal(0.0, 1.0, n_users)
    act = act / act.sum()
    users = rng.choice(n_users, n_rows, p=act) + 1
    pop = 1.0 / np.arange(1, n_items + 1) ** 0.8
    pop = pop / pop.sum()
    item_perm = rng.permutation(n_items) + 1
    items = item_perm[rng.choice(n_items, n_rows, p=pop)]
    ratings = rng.choice([1, 2, 3, 4, 5], n_rows, p=[0.05, 0.1, 0.25, 0.35, 0.25])
    ts = rng.integers(956_700_000, 1_046_400_000, n_rows)
    # dedupe (user,item) like a real log
    key = users.astype(np.int64) * (n_items + 1) + items
    _, first = np.unique(key, return_index=True)
    sel = np.sort(first)
    users, items, ratings, ts = users[sel], items[sel], ratings[sel], ts[sel]

    with open(os.path.join(raw_dir, "ratings.dat"), "w") as f:
        f.writelines(
            f"{u}::{i}::{r}::{t}\n"
            for u, i, r, t in zip(users, items, ratings, ts)
        )
    genres = ["Action", "Comedy", "Drama", "Horror", "Sci-Fi", "Romance"]
    with open(os.path.join(raw_dir, "movies.dat"), "w") as f:
        for m in range(1, n_items + 1):
            g = "|".join(rng.choice(genres, rng.integers(1, 3), replace=False))
            f.write(f"{m}::Movie {m} ({1960 + m % 40})::{g}\n")
    with open(os.path.join(raw_dir, "users.dat"), "w") as f:
        for u in range(1, n_users + 1):
            f.write(f"{u}::{'MF'[u % 2]}::{int(rng.choice([1, 18, 25, 35, 45]))}"
                    f"::{int(rng.integers(0, 21))}::{int(rng.integers(10000, 99999))}\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    from hypergraph_diffusion_for_recommendation_tpu.utils.convert import (
        atomic_to_ratings,
        convert_ml1m,
    )

    raw = os.path.join(WORK, "raw")
    out = os.path.join(WORK, "converted")
    shutil.rmtree(WORK, ignore_errors=True)

    t0 = time.time()
    synthesize_ml1m(raw, args.rows)
    t_gen = time.time() - t0

    t0 = time.time()
    res = convert_ml1m(raw, out)
    t_conv = time.time() - t0
    n_inter = res["inter"][1]

    t0 = time.time()
    ratings_path = os.path.join(out, "ratings.txt")
    n_kept = atomic_to_ratings(
        res["inter"][0], ratings_path, min_rating=4.0, k_core=5,
    )
    t_kcore = time.time() - t0

    # reference-layout split for the CLI (header + user \t item)
    rng = np.random.default_rng(7)
    pairs = np.loadtxt(ratings_path, dtype=np.float64, usecols=(0, 1),
                       skiprows=1).astype(np.int64)
    n_u, n_i = len(np.unique(pairs[:, 0])), len(np.unique(pairs[:, 1]))
    perm = rng.permutation(len(pairs))
    cut = int(len(pairs) * 0.75)
    ddir = os.path.join(WORK, "dataset", "ml-1m")
    os.makedirs(ddir, exist_ok=True)
    for name, sel in (("train.txt", perm[:cut]), ("test.txt", perm[cut:])):
        with open(os.path.join(ddir, name), "w") as f:
            f.write("user\titem\n")
            f.writelines(f"{u}\t{i}\n" for u, i in pairs[sel])

    line = (f"converter-scale: raw {args.rows:,} rows -> {n_inter:,} unique inter "
            f"({t_gen:.1f}s gen, {t_conv:.1f}s convert) -> min_rating 4.0 + "
            f"5-core {n_kept:,} edges / {n_u:,} users / {n_i:,} items "
            f"({t_kcore:.1f}s)")
    print(line, flush=True)

    if not args.skip_train:
        t0 = time.time()
        from hypergraph_diffusion_for_recommendation_tpu import cli

        result = cli.main([
            "--model=LightGCN", "--dataset=ml-1m",
            "--data_dir", os.path.join(WORK, "dataset"),
            "--max_epoch", str(args.epochs), "--early_stopping_steps", "50",
            "--output_dir", os.path.join(WORK, "results"), "--quiet",
        ])
        print(f"PASS {line}; CLI train {args.epochs} epochs ok "
              f"(recall@20 {result.final_metrics[20]['recall']:.4f}, "
              f"{time.time()-t0:.0f}s)", flush=True)
    else:
        print(f"PASS {line}; train skipped", flush=True)


if __name__ == "__main__":
    main()
