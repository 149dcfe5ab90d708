"""Command-line interface — flag parity with reference `main.py:6-95` and
the orchestration of `SELFRec.py`.

    python -m hypergraph_diffusion_for_recommendation_tpu.cli \
        --model=KHGRec --dataset=lastfm --lrate=0.001 --experiment=full

Experiment-aware loading (SELFRec.py:12-33): the reference reads
pre-generated variant files (missing/train_30.txt etc.); here variant
files are used when present, otherwise the variant is derived in-memory
from the base split (data/experiments.py) — same construction as
dataset_util.py. `--dataset=synthetic` generates the planted-structure
benchmark dataset.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="TPU-native hypergraph-diffusion recommender")
    p.add_argument("--experiment", type=str, default="full",
                   choices=["full", "cold_start", "missing", "add_noise"])
    p.add_argument("--group_id", type=int, default=1, choices=[1, 2, 3, 4])
    p.add_argument("--missing_pct", type=int, default=0, choices=[0, 10, 20, 30, 40, 50])
    p.add_argument("--noise_pct", type=int, default=0, choices=[0, 10, 20, 30, 40, 50])
    p.add_argument("--model", type=str, default="HCCF")
    p.add_argument("--conf", type=str, default="",
                   help="reference-format .conf file (utils/conf.py); CLI flags override")
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--data_dir", type=str, default="./dataset")
    p.add_argument("--seed", type=int, default=60)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--lrate", type=float, default=None)
    p.add_argument("--item_ranking", type=str, default="10,20,40")
    p.add_argument("--max_epoch", type=int, default=500)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--hyperedge_num", type=int, default=None)
    p.add_argument("--batch_size_kg", type=int, default=None)
    p.add_argument("--n_layers", type=int, default=None)
    p.add_argument("--embedding_size", type=int, default=None)
    p.add_argument("--input_dim", type=int, default=None)
    p.add_argument("--relation_dim", type=int, default=None)
    p.add_argument("--hyper_dim", type=int, default=None)
    p.add_argument("--lr_decay", type=float, default=None)
    p.add_argument("--weight_decay", type=float, default=None)
    p.add_argument("--reg", type=float, default=None)
    p.add_argument("--reg_kg", type=float, default=None)
    p.add_argument("--p", type=float, default=None)
    p.add_argument("--drop_rate", type=float, default=None)
    p.add_argument("--nheads", type=int, default=None)
    p.add_argument("--temp", type=float, default=None)
    p.add_argument("--cl_rate", type=float, default=None)
    p.add_argument("--mode", type=str, default="full",
                   choices=["full", "woatt", "wossl", "wohyper", "woglobal", "local_only", "group_only"])
    p.add_argument("--aug_type", type=int, default=None)
    p.add_argument("--laplacian_type", type=str, default=None)
    p.add_argument("--aggregation_type", type=str, default=None)
    p.add_argument("--conv_dim_list", type=str, default=None, help="e.g. '[64, 32, 16]'")
    p.add_argument("--mess_dropout", type=str, default=None, help="e.g. '[0.1, 0.1, 0.1]'")
    p.add_argument("--early_stopping_steps", type=int, default=None)
    p.add_argument("--early_stop_smooth", type=int, default=None,
                   help="trailing moving-average window for the early-stop "
                        "signal (1 = reference-parity raw recall; >1 smooths "
                        "the patience signal against plateau-lottery stops)")
    p.add_argument("--early_stop_patience_scale", type=int, default=None,
                   help="patience multiplier: 0 = model default (x2 for "
                        "self-att encoders and HCCF, whose measured recall "
                        "troughs outlast the standard patience); explicit "
                        "value pins it (1 = reference protocol)")
    p.add_argument("--evaluate_every", type=int, default=None)
    p.add_argument("--sht_reg", type=str, default=None,
                   choices=["batch", "full"],
                   help="SHT regularisation: 'batch' (product default, "
                        "batch-row L2) or 'full' (the reference's exact "
                        "full-parameter calcRegLoss — norm-collapse seed "
                        "lottery at the pinned parity config)")
    p.add_argument("--prop_cache_steps", type=int, default=None,
                   help="K>1 trains the KHGRec and HD families on cached "
                        "propagated tables refreshed by a true full-graph "
                        "step every K steps (straight-through gradients "
                        "between refreshes) — skips the full-graph spmm "
                        "chains on K-1 of K steps; 0/1 = off "
                        "(reference-parity semantics); models outside "
                        "those families ignore the knob. Quality A/B: "
                        "results/prop_cache_ab/")
    # accepted for reference run-script compatibility (main.py:16,87-89):
    # gpu_id is meaningless on TPU; print cadences map to log verbosity
    p.add_argument("--gpu_id", type=int, default=0,
                   help="ignored (TPU backend; kept for reference-script compatibility)")
    p.add_argument("--cf_print_every", type=int, default=1, help="ignored (per-epoch logging)")
    p.add_argument("--kg_print_every", type=int, default=1, help="ignored (per-epoch logging)")
    # TPU-native additions
    p.add_argument("--async_eval", action="store_true",
                   help="accepted for compatibility; a no-op since the "
                        "one-epoch-lag machinery was measured to hide 0% "
                        "(train and eval share one device queue)")
    p.add_argument("--mesh_data", type=int, default=1)
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--gather_layout", type=str, default="auto",
                   choices=("auto", "base", "dedup", "int8", "dedup_int8"),
                   help="pallas gather layout: auto selects dedup by column "
                        "multiplicity (1.89x at ML-1M density); int8 variants "
                        "quantise the gathered operand (~1%% fwd error)")
    p.add_argument("--shard_graph", type=str, default="auto",
                   choices=("auto", "on", "off"),
                   help="row-window-shard graph adjacencies over the model "
                        "axis (parallel/sharded_adj.py); auto shards the "
                        "representations the model declares safe")
    p.add_argument("--sampler", type=str, default=None,
                   choices=("redraw", "exact"),
                   help="negative sampler: redraw = on-device fixed-round "
                        "redraw (default); exact = host-side exact rejection "
                        "with the reference's semantics (parity A/B control)")
    p.add_argument("--output_dir", type=str, default="./results")
    p.add_argument("--export_embeddings", action="store_true",
                   help="write <run_dir>/embeddings.npz for standalone "
                        "serving (serving_cli / eval.serving.Retriever)")
    p.add_argument("--save_checkpoints", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans: fail at the op that first "
                        "produces a NaN (reference parity: KGAT NaN checks / "
                        "HGNN_HD3 set_detect_anomaly)")
    return p.parse_args(argv)


def extract_overrides(args: argparse.Namespace) -> dict:
    overrides = {}
    for key in (
        "experiment", "group_id", "missing_pct", "noise_pct", "dataset", "data_dir",
        "seed", "alpha", "lrate", "max_epoch", "batch_size", "hyperedge_num",
        "batch_size_kg", "n_layers", "embedding_size", "input_dim", "relation_dim",
        "hyper_dim", "lr_decay", "weight_decay", "reg", "reg_kg", "p", "drop_rate",
        "nheads", "temp", "cl_rate", "mode", "aug_type", "laplacian_type",
        "aggregation_type", "early_stopping_steps", "early_stop_smooth",
        "early_stop_patience_scale", "evaluate_every", "prop_cache_steps",
        "sht_reg",
        "mesh_data", "mesh_model", "shard_graph", "gather_layout", "sampler",
        "output_dir", "save_checkpoints", "resume",
    ):
        v = getattr(args, key)
        if v is not None:
            overrides[key] = v
    if args.export_embeddings:
        overrides["export_embeddings"] = True
    overrides["item_ranking"] = tuple(int(x) for x in args.item_ranking.split(","))
    if args.conv_dim_list:
        overrides["conv_dim_list"] = tuple(json.loads(args.conv_dim_list))
    if args.mess_dropout:
        overrides["mess_dropout"] = tuple(json.loads(args.mess_dropout))
    return overrides


def build_config(args: argparse.Namespace):
    from .core.config import make_config

    return make_config(args.model, **extract_overrides(args))


def load_dataset(cfg):
    """Resolve train/test/kg data for the configured experiment."""
    from .data import apply_experiment, synthetic_dataset
    from .data.io import load_data_set, load_kg_data

    if cfg.dataset == "synthetic":
        need_kg = cfg.use_knowledge
        train, test, kg_df = synthetic_dataset(
            n_users=1890, n_items=17632, mean_degree=49.0, seed=7, with_kg=need_kg
        )
        train, test = apply_experiment(
            train, test, cfg.experiment, cfg.seed, cfg.missing_pct, cfg.noise_pct, cfg.group_id
        )
        return train, test, kg_df

    base = os.path.join(cfg.data_dir, cfg.dataset)
    # pre-generated variant files take precedence (SELFRec.py:19-33)
    variant_paths = {
        "missing": (f"missing/train_{cfg.missing_pct}.txt", f"missing/test_{cfg.missing_pct}.txt"),
        "add_noise": (f"add_noise/train_{cfg.noise_pct}.txt", f"add_noise/test_{cfg.noise_pct}.txt"),
        "cold_start": ("cold-start/train.txt", f"cold-start/test_group_{cfg.group_id}.txt"),
    }
    if cfg.experiment in variant_paths:
        tr_p, te_p = (os.path.join(base, q) for q in variant_paths[cfg.experiment])
        if os.path.exists(tr_p) and os.path.exists(te_p):
            train, test = load_data_set(tr_p), load_data_set(te_p)
        else:
            train = load_data_set(os.path.join(base, cfg.training_set))
            test = load_data_set(os.path.join(base, cfg.test_set))
            train, test = apply_experiment(
                train, test, cfg.experiment, cfg.seed, cfg.missing_pct, cfg.noise_pct, cfg.group_id
            )
    else:
        train = load_data_set(os.path.join(base, cfg.training_set))
        test = load_data_set(os.path.join(base, cfg.test_set))

    kg_df = None
    if cfg.use_knowledge:
        kg_path = cfg.knowledge_file or os.path.join(base, f"processed_{cfg.dataset}.kg")
        kg_df = load_kg_data(kg_path)
    return train, test, kg_df


def run(cfg, quiet: bool = False):
    from .data import (
        build_cf_device_data,
        build_interaction,
        build_kg_device_data,
        build_knowledge,
    )
    from .models import build_model, model_data_needs
    from .parallel import make_mesh
    from .train import Trainer
    from .utils.logging import RunArtifacts, run_dir

    # propagation compute mode (bf16 halves sparse-op HBM traffic)
    from .data import device as _device_mod

    _device_mod.PALLAS_BF16 = cfg.compute_dtype == "bfloat16"
    _device_mod.PALLAS_DISABLE = cfg.use_pallas == "never"
    # Always (re)set BOTH layout globals: in-process sequential cli.main()
    # calls (run_parity.py, converter_scale_check.py) must not inherit a
    # forced layout from an earlier run — 'auto' restores env defaults.
    if cfg.gather_layout != "auto":
        _device_mod.PALLAS_DEDUP = (
            "1" if cfg.gather_layout in ("dedup", "dedup_int8") else "0"
        )
        _device_mod.PALLAS_INT8 = cfg.gather_layout in ("int8", "dedup_int8")
    else:
        _device_mod.PALLAS_DEDUP = os.environ.get("HGDR_DEDUP", "auto")
        _device_mod.PALLAS_INT8 = os.environ.get("HGDR_INT8") == "1"

    mesh = None
    if cfg.mesh_data * cfg.mesh_model > 1:
        mesh = make_mesh(cfg.mesh_data, cfg.mesh_model)

    # graph sharding: row-window-shard the adjacencies a model consumes
    # purely through spmm chains over the mesh's model axis
    from .models import model_shard_needs

    shard_needs = frozenset()
    if cfg.shard_graph != "off" and mesh is not None and cfg.mesh_model > 1:
        shard_needs = model_shard_needs(cfg.model)
        if cfg.shard_graph == "on" and not shard_needs:
            raise ValueError(
                f"--shard_graph=on: model {cfg.model} has no shardable "
                "adjacency representations (models.base._MODEL_SHARD_NEEDS)"
            )

    t0 = time.time()
    train, test, kg_df = load_dataset(cfg)
    inter = build_interaction(train, test)
    cf_dev = build_cf_device_data(
        inter, eval_user_multiple=cfg.eval_user_batch,
        needs=model_data_needs(cfg.model),
        mesh=mesh, shard_needs=shard_needs,
    )
    kg_dev = None
    if cfg.use_knowledge and kg_df is not None:
        kg_dev = build_kg_device_data(
            build_knowledge(kg_df, inter), mesh=mesh, shard="kg" in shard_needs
        )
    print(
        f"data: {inter.n_users} users / {inter.n_items} items / "
        f"{inter.n_cf_train} train edges ({time.time()-t0:.1f}s)"
        + (f"  [sharded: {sorted(shard_needs)}]" if shard_needs else "")
    )

    bundle = build_model(cfg, cf_dev, kg_dev, mesh=mesh)
    trainer = Trainer(bundle, mesh=mesh)

    artifacts = RunArtifacts(cfg)
    ckpt = None
    start_epoch = 0
    if cfg.save_checkpoints or cfg.resume:
        from .utils.checkpoint import CheckpointManager

        ckpt = CheckpointManager(os.path.join(run_dir(cfg), "checkpoints"))
        if cfg.resume:
            start_epoch = trainer.restore(ckpt)
            if start_epoch and not quiet:
                print(f"resumed from epoch {start_epoch}")

    try:
        result = trainer.fit(
            quiet=quiet, artifacts=artifacts, ckpt=ckpt, start_epoch=start_epoch
        )
    finally:
        if ckpt is not None:
            # Joins the in-flight background save (and surfaces any save
            # error) before the process can exit and drop it.
            ckpt.close()
    if cfg.export_embeddings:
        # fit() has reset trainer params to the best epoch's snapshot
        from .eval.serving import export_embeddings

        u_emb, i_emb = bundle.encode_eval(trainer.params, trainer.extras)
        path = export_embeddings(
            os.path.join(run_dir(cfg), "embeddings.npz"),
            u_emb, i_emb, inter.id2user, inter.id2item,
            rated_pad=cf_dev.rated_pad,
            meta={"model": cfg.model, "dataset": cfg.dataset,
                  "best_epoch": result.best_epoch},
        )
        print(f"embeddings exported: {path}")
    print(f"best epoch {result.best_epoch}: {result.best_metrics}")
    print(f"final metrics: {result.final_metrics}")
    print(f"throughput: {result.examples_per_sec:,.0f} examples/sec")
    return result


def main(argv=None):
    args = parse_args(argv)
    if args.conf:
        # conf file supplies defaults; CLI flags win (reference
        # precedence, survey 2.10)
        from .utils.conf import config_from_conf

        cfg = config_from_conf(args.conf, **extract_overrides(args))
    else:
        cfg = build_config(args)
    s = time.time()
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    result = run(cfg, quiet=args.quiet)
    print(f"Running time: {time.time() - s:.1f} s")
    return result


if __name__ == "__main__":
    main()
