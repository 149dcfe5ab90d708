"""Eval-stack isolation A/B for the NDCG@20 parity deficit (VERDICT r3 #1).

Feeds ONE set of converged rebuild embeddings through three evaluation
stacks and compares the metrics:

  true     — exact numpy top-k (stable first-occurrence ties, the
             semantics of lax.top_k) + the reference's metric formulas.
  ours     — the framework's on-device eval (eval/metrics.ranking_metrics)
             on the same embeddings. Expected == `true` (bit-parity).
  ref      — the REFERENCE'S OWN eval code imported from the parity
             sandbox: util.algorithm.find_k_largest (numba shimmed to
             plain Python) + util.evaluation.ranking_evaluation, fed the
             identical masked score rows.

Because all three consume the same score matrix, any metric difference
is PURELY evaluation semantics — training, sampling and RNG are out of
the loop. The known defect under test: this reference fork's
find_k_largest (util/algorithm.py:143-173) seeds its list with item ids
0..K-1 and then re-scans ALL candidates from index 0, so first-K ids
that survive in the final top-K are inserted AGAIN — the returned list
contains DUPLICATES (measured: ~2.4 dup slots per top-40 at 600-item
catalogs, ~0.04 at 17k). A duplicated hit adds its log-discount to DCG
twice (inflating reference NDCG) while evicting a real candidate from
the window (deflating reference recall).

Usage:
  python scripts/cross_eval_check.py                 # train LightGCN seed 1
  python scripts/cross_eval_check.py --models LightGCN,HCCF --seeds 1,2
  python scripts/cross_eval_check.py --npz path.npz  # skip training
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import types

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SANDBOX = os.path.join(ROOT, "parity", "sandbox")
DATASET_DIR = os.path.join(SANDBOX, "dataset")


def load_ref_eval():
    """Import the reference's own find_k_largest + ranking_evaluation from
    the parity sandbox (numba shimmed exactly as parity_ref_runner does)."""
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
        numba.njit = numba.jit
        sys.modules["numba"] = numba
    sys.path.insert(0, SANDBOX)
    from util.algorithm import find_k_largest  # noqa: PLC0415
    from util.evaluation import ranking_evaluation  # noqa: PLC0415

    sys.path.remove(SANDBOX)
    return find_k_largest, ranking_evaluation


def train_embeddings(model: str, seed: int, max_epoch: int, early_stop: int) -> str:
    """Train the rebuild on the shared parity dataset with the pinned
    parity flags and return the exported embeddings.npz path."""
    from scripts.run_parity import COMMON, MODEL_FLAGS, ensure_sandbox

    ensure_sandbox()
    from hypergraph_diffusion_for_recommendation_tpu import cli

    out_dir = os.path.join(ROOT, "parity", "cross_eval_runs")
    argv = [f"--model={model}", f"--seed={seed}", f"--max_epoch={max_epoch}",
            f"--early_stopping_steps={early_stop}", *COMMON,
            *MODEL_FLAGS.get(model, []),
            "--data_dir", DATASET_DIR,
            "--output_dir", out_dir,
            "--item_ranking", "10,20,40",
            "--export_embeddings", "--quiet"]
    cli.main(argv)
    pats = glob.glob(os.path.join(out_dir, model, "**", f"*seed{seed}*",
                                  "embeddings.npz"), recursive=True)
    if not pats:
        pats = glob.glob(os.path.join(out_dir, model, "**", "embeddings.npz"),
                         recursive=True)
    assert pats, f"no embeddings.npz under {out_dir}/{model}"
    return max(pats, key=os.path.getmtime)


def build_origin(test_users: np.ndarray, test_items: np.ndarray) -> dict:
    """Reference-style test_set dict in dense-id space. Items unseen in
    training (dense id -2, parity with ui_graph.py:63-68) become unique
    negative keys so they stay unhittable but count in |test(u)| and IDCG
    — exactly the reference's raw-name behaviour."""
    origin: dict[int, dict] = {}
    fresh = -2
    for u, i in zip(test_users.tolist(), test_items.tolist()):
        d = origin.setdefault(int(u), {})
        if i == -2:
            d[fresh] = 1
            fresh -= 1
        else:
            d[int(i)] = 1
    return origin


def eval_three_ways(npz_path: str, top_ns=(10, 20, 40)) -> dict:
    find_k_largest, ranking_evaluation = load_ref_eval()

    from hypergraph_diffusion_for_recommendation_tpu.data.dataset import (
        build_interaction,
    )
    from hypergraph_diffusion_for_recommendation_tpu.data.io import load_data_set

    z = np.load(npz_path)
    u_emb, i_emb = z["user_emb"], z["item_emb"]
    rated_pad = z["rated_pad"]
    meta = json.loads(bytes(z["meta"]).decode())

    train = load_data_set(os.path.join(DATASET_DIR, "lastfm", "train.txt"))
    test = load_data_set(os.path.join(DATASET_DIR, "lastfm", "test.txt"))
    inter = build_interaction(train, test)
    assert inter.n_users == u_emb.shape[0] and inter.n_items == i_emb.shape[0]

    origin = build_origin(inter.test_u, inter.test_i)
    users = sorted(origin)
    max_n = max(top_ns)

    # shared masked score rows (f64 matmul of the f32 tables — identical
    # input to every stack below; the reference itself scores f32, but
    # the comparison here needs all stacks to see ONE number per item)
    scores = (u_emb[users] @ i_emb.T).astype(np.float32)
    for row, u in enumerate(users):
        rated = rated_pad[u]
        scores[row, rated[rated >= 0]] = -10e8  # main_recommender.py:88

    # --- stack 1: true top-k (stable ties) + reference formulas
    def true_rec_list():
        rec = {}
        ar = np.arange(scores.shape[1])
        for row, u in enumerate(users):
            c = scores[row]
            # full stable sort (score desc, id asc): argpartition is
            # arbitrary about boundary-tied items
            ids = np.lexsort((ar, -c))[:max_n]
            rec[u] = list(zip(ids.tolist(), c[ids].tolist()))
        return rec

    # --- stack 2: the reference's own find_k_largest (duplicate defect)
    def ref_rec_list():
        rec = {}
        for row, u in enumerate(users):
            ids, ss = find_k_largest(max_n, scores[row])
            rec[u] = list(zip(ids, ss))
        return rec

    def parse(measure):
        out = {}
        key = None
        for line in measure:
            line = line.strip()
            if line.startswith("Top "):
                key = int(line.split()[1])
                out[key] = {}
            elif ":" in line and key is not None:
                k, v = line.split(":")
                out[key][{"Hit Ratio": "hit_ratio", "Precision": "precision",
                          "Recall": "recall", "NDCG": "ndcg"}[k]] = float(v)
        return out

    res = {}
    rec_t = true_rec_list()
    rec_r = ref_rec_list()
    res["true"] = parse(ranking_evaluation(origin, rec_t, list(top_ns)))
    res["ref"] = parse(ranking_evaluation(origin, rec_r, list(top_ns)))

    dup = np.mean([max_n - len({i for i, _ in rec_r[u]}) for u in users])
    dup20 = np.mean([20 - len({i for i, _ in rec_r[u][:20]}) for u in users])
    res["dup_slots_per_topk"] = float(dup)
    res["dup_slots_per_top20"] = float(dup20)

    # --- stack 3: the framework's own on-device eval
    from hypergraph_diffusion_for_recommendation_tpu.data.device import (
        build_cf_device_data,
    )
    from hypergraph_diffusion_for_recommendation_tpu.eval.metrics import (
        metrics_to_host,
        ranking_metrics,
    )

    cf = build_cf_device_data(inter, eval_user_multiple=256)
    m = ranking_metrics(u_emb, i_emb, cf.rated_pad, cf.eval_data, tuple(top_ns))
    res["ours"] = metrics_to_host(m, tuple(top_ns))
    res["meta"] = meta
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="LightGCN")
    ap.add_argument("--seeds", default="1")
    ap.add_argument("--max_epoch", type=int, default=60)
    ap.add_argument("--early_stopping_steps", type=int, default=15)
    ap.add_argument("--npz", default=None, help="evaluate an existing export")
    args = ap.parse_args()

    jobs = []
    if args.npz:
        jobs.append(("npz", 0, args.npz))
    else:
        for model in args.models.split(","):
            for seed in args.seeds.split(","):
                path = train_embeddings(model, int(seed), args.max_epoch,
                                        args.early_stopping_steps)
                jobs.append((model, int(seed), path))

    for model, seed, path in jobs:
        res = eval_three_ways(path)
        print(f"\n=== {model} seed {seed} ({path}) ===")
        print(f"reference top-40 duplicate slots/user: "
              f"{res['dup_slots_per_topk']:.2f} "
              f"(top-20 window: {res['dup_slots_per_top20']:.2f})")
        for n in (10, 20, 40):
            t, r, o = res["true"][n], res["ref"][n], res["ours"][n]
            print(f"@{n}: true recall={t['recall']:.5f} ndcg={t['ndcg']:.5f} | "
                  f"ours recall={o['recall']:.5f} ndcg={o['ndcg']:.5f} | "
                  f"REF-eval recall={r['recall']:.5f} ndcg={r['ndcg']:.5f} | "
                  f"ref-true: recall {r['recall']-t['recall']:+.5f} "
                  f"ndcg {r['ndcg']-t['ndcg']:+.5f}")
        for n in (10, 20, 40):
            t, o = res["true"][n], res["ours"][n]
            for k in ("hit_ratio", "precision", "recall", "ndcg"):
                assert abs(t[k] - o[k]) < 2e-5, (n, k, t[k], o[k])
        print("ours == true top-k metrics (bit-parity confirmed)")


if __name__ == "__main__":
    main()
