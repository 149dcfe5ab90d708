"""Smoke + learning tests for the CF model zoo."""

import pytest

# per-model learning tests (many training epochs on the virtual CPU
# mesh) live in the slow tier; `pytest -q -m slow` runs them
pytestmark = pytest.mark.slow

import numpy as np
import pytest

from hypergraph_diffusion_for_recommendation_tpu.core import make_config
from hypergraph_diffusion_for_recommendation_tpu.data import (
    build_cf_device_data,
    build_interaction,
)
from hypergraph_diffusion_for_recommendation_tpu.models import build_model
from hypergraph_diffusion_for_recommendation_tpu.train import Trainer

CASES = [
    ("SGL", 15, dict(lrate=0.05, cl_rate=0.05, temp=0.2, drop_rate=0.1)),
    ("HCCF", 40, dict(lrate=0.001, cl_rate=1e-4, temp=0.2, hyper_dim=64, drop_rate=0.3)),
    ("DHCF", 15, dict(lrate=0.01, hyper_dim=32)),
    ("SHT", 15, dict(lrate=0.02, hyper_dim=32, hyperedge_num=32, cl_rate=0.001, temp=0.2)),
    ("HGCN", 15, dict(lrate=0.01, hyper_dim=32, n_layers=2, drop_rate=0.1)),
]


@pytest.mark.parametrize("name,epochs,kw", CASES, ids=[c[0] for c in CASES])
def test_cf_model_learns(tiny_dataset, name, epochs, kw):
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cfg = make_config(
        name,
        batch_size=512,
        embedding_size=32,
        item_ranking=(10, 20),
        eval_user_batch=64,
        max_epoch=epochs,
        early_stopping_steps=epochs,
        **kw,
    )
    cf = build_cf_device_data(inter, eval_user_multiple=cfg.eval_user_batch)
    bundle = build_model(cfg, cf)
    trainer = Trainer(bundle)
    result = trainer.fit(quiet=True)
    losses = [r.losses["train_loss"] for r in result.history]
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    # must clearly beat chance (recall@20 ~ 0.07 for random scores)
    assert result.best_metrics["recall"] > 0.12, (name, result.best_metrics)
