"""Steady-epoch probe at ML-1M shape (the bench.py ml1m_shape recipe).

Measures the full ~1.6M-nnz KHGRec steady epoch for a list of
prop_cache_steps values in ONE process (shared dataset; one Trainer per
arm, freed between arms). Used to validate the round-5 real-scale
optimizations (balanced chunking, cached propagation) on the real chip.

Usage: python scripts/ml1m_shape_probe.py [--ks 0,8] [--epochs 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", type=str, default="0,8")
    ap.add_argument("--model", type=str, default="KHGRec",
                    choices=["KHGRec", "HGNN_HD3"])
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--users", type=int, default=6040)
    ap.add_argument("--items", type=int, default=3706)
    ap.add_argument("--degree", type=float, default=147.0)
    args = ap.parse_args()

    from hypergraph_diffusion_for_recommendation_tpu.data import device as _dev

    _dev.PALLAS_BF16 = True

    import jax

    from hypergraph_diffusion_for_recommendation_tpu.core import make_config
    from hypergraph_diffusion_for_recommendation_tpu.data import (
        build_cf_device_data, build_interaction, build_kg_device_data,
        build_knowledge, synthetic_dataset,
    )
    from hypergraph_diffusion_for_recommendation_tpu.models import (
        build_model, model_data_needs,
    )
    from hypergraph_diffusion_for_recommendation_tpu.train import Trainer

    t0 = time.time()
    train, test, kg_df = synthetic_dataset(
        n_users=args.users, n_items=args.items, n_clusters=64,
        mean_degree=args.degree, seed=7, with_kg=True,
    )
    inter = build_interaction(train, test)
    cf = build_cf_device_data(
        inter, eval_user_multiple=512, needs=model_data_needs(args.model)
    )
    kgd = None
    n_kg = 0
    if args.model == "KHGRec":
        kg = build_knowledge(kg_df, inter)
        kgd = build_kg_device_data(kg)
        n_kg = kg.n_kg_train
    print(f"data: {inter.n_cf_train} edges, {n_kg} kg triples "
          f"({time.time()-t0:.1f}s)", flush=True)

    model_kw = (
        dict(batch_size_kg=8192, relation_dim=32, temp=1.0, cl_rate=0.01,
             mode="full") if args.model == "KHGRec"
        else dict(cl_rate=1e-5, temp=0.2, reg=0.1)
    )
    for k in (int(x) for x in args.ks.split(",")):
        cfg = make_config(
            args.model, batch_size=2048, hyper_dim=128,
            item_ranking=(10, 20), eval_user_batch=512,
            max_epoch=args.epochs + 1, early_stopping_steps=100,
            lrate=0.001, drop_rate=0.2,
            prop_cache_steps=k, **model_kw,
        )
        trainer = Trainer(build_model(cfg, cf, kgd))
        print(f"K={k}: n_batches={trainer.n_batches} "
              f"chunk={trainer._chunk_steps}", flush=True)
        t0 = time.time()
        loss, _ = trainer.run_epoch(0)
        jax.block_until_ready(jax.tree.leaves(trainer.params)[0])
        warm = time.time() - t0
        t0 = time.time()
        for ep in range(args.epochs):
            loss, _ = trainer.run_epoch(ep + 1)
        jax.block_until_ready(jax.tree.leaves(trainer.params)[0])
        epoch_s = (time.time() - t0) / args.epochs
        eps = trainer.n_batches * cfg.batch_size / epoch_s
        print(f"K={k}: warmup {warm:.1f}s, steady epoch {epoch_s:.2f}s = "
              f"{eps:,.0f} examples/sec (loss {float(loss):.4f})",
              flush=True)
        del trainer


if __name__ == "__main__":
    main()
