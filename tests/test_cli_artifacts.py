"""CLI, artifacts, and checkpoint/resume tests."""

import os

import numpy as np
import pytest


def test_cli_end_to_end(tmp_path, monkeypatch):
    """Full CLI path on a written-to-disk dataset incl. variant derivation."""
    from hypergraph_diffusion_for_recommendation_tpu.data import synthetic_dataset
    from hypergraph_diffusion_for_recommendation_tpu.data.io import write_interactions
    from hypergraph_diffusion_for_recommendation_tpu import cli

    train, test, _ = synthetic_dataset(n_users=80, n_items=200, mean_degree=15.0, seed=9)
    ddir = tmp_path / "dataset" / "tiny"
    write_interactions(str(ddir / "train.txt"), train)
    write_interactions(str(ddir / "test.txt"), test)

    args = cli.parse_args(
        [
            "--model=MF", "--dataset=tiny", f"--data_dir={tmp_path/'dataset'}",
            "--max_epoch=3", "--batch_size=256", "--lrate=0.05",
            "--item_ranking=10,20", "--experiment=missing", "--missing_pct=10",
            f"--output_dir={tmp_path/'results'}", "--quiet",
            "--export_embeddings",
        ]
    )
    cfg = cli.build_config(args)
    cfg = cfg.replace(log_dir=str(tmp_path / "log"), eval_user_batch=64)
    result = cli.run(cfg, quiet=True)
    assert len(result.history) == 3
    # artifacts written
    from hypergraph_diffusion_for_recommendation_tpu.utils.logging import run_dir

    rd = run_dir(cfg)
    assert os.path.exists(os.path.join(rd, "train_performance.csv"))
    assert os.path.exists(os.path.join(rd, "loss.csv"))
    assert os.path.exists(os.path.join(rd, "final_metrics.csv"))
    # serving export is loadable and answers queries
    from hypergraph_diffusion_for_recommendation_tpu.eval.serving import Retriever

    r = Retriever.load(os.path.join(rd, "embeddings.npz"))
    assert r.meta["model"] == "MF" and r.meta["best_epoch"] == result.best_epoch
    ids, scores = r.topk([int(r.id2user[0])], k=5)
    assert ids.shape == (1, 5) and np.isfinite(scores).all()


def test_cli_early_stop_smooth_plumbs_to_config():
    from hypergraph_diffusion_for_recommendation_tpu import cli

    args = cli.parse_args(["--model=HCCF", "--early_stop_smooth=5"])
    assert cli.build_config(args).early_stop_smooth == 5
    # omitted -> model/global default (reference-parity raw rule)
    args = cli.parse_args(["--model=LightGCN"])
    assert cli.build_config(args).early_stop_smooth == 1


def test_hccf_patience_default_and_override(tiny_dataset):
    """HCCF's x2 patience bundle default (22-epoch recall trough,
    results/stopping_rule_ab) must engage unless the config pins a
    scale; LightGCN stays at the raw reference rule."""
    from hypergraph_diffusion_for_recommendation_tpu.core import make_config
    from hypergraph_diffusion_for_recommendation_tpu.data import (
        build_cf_device_data,
        build_interaction,
    )
    from hypergraph_diffusion_for_recommendation_tpu.models import (
        build_model,
        model_data_needs,
    )

    train, test = tiny_dataset
    inter = build_interaction(train, test)

    def scale_for(model, **kw):
        cfg = make_config(model, max_epoch=1, **kw)
        cf = build_cf_device_data(inter, needs=model_data_needs(model))
        bundle = build_model(cfg, cf, None)
        return (
            cfg.early_stop_patience_scale
            if cfg.early_stop_patience_scale > 0
            else bundle.early_stop_patience_scale
        )

    assert scale_for("HCCF") == 2
    assert scale_for("HCCF", early_stop_patience_scale=1) == 1
    assert scale_for("LightGCN") == 1


def test_checkpoint_resume(tmp_path, tiny_dataset):
    from hypergraph_diffusion_for_recommendation_tpu.core import make_config
    from hypergraph_diffusion_for_recommendation_tpu.data import (
        build_cf_device_data,
        build_interaction,
    )
    from hypergraph_diffusion_for_recommendation_tpu.models import build_model
    from hypergraph_diffusion_for_recommendation_tpu.train import Trainer
    from hypergraph_diffusion_for_recommendation_tpu.utils.checkpoint import CheckpointManager

    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cfg = make_config(
        "MF", batch_size=512, item_ranking=(10,), eval_user_batch=64,
        max_epoch=4, early_stopping_steps=10, lrate=0.05,
    )
    cf = build_cf_device_data(inter, eval_user_multiple=64)

    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    t1 = Trainer(build_model(cfg, cf))
    t1.fit(quiet=True, ckpt=ckpt, ckpt_every=2)
    assert ckpt.latest_step() == 3

    t2 = Trainer(build_model(cfg, cf))
    start = t2.restore(ckpt)
    assert start == 4
    # restored params match saved params bit-exactly
    import jax

    leaves1 = jax.tree.leaves(t1.params)
    leaves2 = jax.tree.leaves(t2.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed training continues without error
    loss, _ = t2.run_epoch(4)
    assert np.isfinite(loss)
    ckpt.close()
