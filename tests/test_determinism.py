"""Determinism: same seed -> bit-identical training (the reference's seed
discipline, KHGRec.py:77-88, minus the cuDNN knobs TPU doesn't need)."""

import numpy as np

from hypergraph_diffusion_for_recommendation_tpu.core import make_config
from hypergraph_diffusion_for_recommendation_tpu.data import (
    build_cf_device_data,
    build_interaction,
)
from hypergraph_diffusion_for_recommendation_tpu.models import build_model
from hypergraph_diffusion_for_recommendation_tpu.train import Trainer


def test_same_seed_same_run(tiny_dataset):
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cfg = make_config(
        "LightGCN", batch_size=256, embedding_size=32, item_ranking=(10,),
        eval_user_batch=64, max_epoch=3, early_stopping_steps=5, seed=123,
    )
    cf = build_cf_device_data(inter, eval_user_multiple=64)

    losses = []
    finals = []
    for _ in range(2):
        t = Trainer(build_model(cfg, cf))
        run = [t.run_epoch(ep)[0] for ep in range(3)]
        losses.append(run)
        finals.append(np.asarray(t.params["params"]["user_emb"]))
    assert losses[0] == losses[1]
    np.testing.assert_array_equal(finals[0], finals[1])

    # different seed -> different run
    t3 = Trainer(build_model(cfg.replace(seed=7), cf))
    run3 = [t3.run_epoch(ep)[0] for ep in range(3)]
    assert run3 != losses[0]
