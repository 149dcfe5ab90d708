"""HD (hypergraph diffusion) family tests."""

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
    ("HD", 20, dict(lrate=0.01, hyper_dim=32, reg=0.1, drop_rate=0.2)),
    ("HGNN_HD", 40, dict(lrate=0.01, hyper_dim=32, reg=0.1, drop_rate=0.2)),
    ("HGNN_HD3", 25, dict(lrate=0.01, hyper_dim=32, reg=0.1, drop_rate=0.2, cl_rate=1e-5, temp=0.2, mode="full")),
    ("HGNN_HD3", 20, dict(lrate=0.01, hyper_dim=32, reg=0.1, drop_rate=0.2, mode="local_only")),
    ("WaveletHD", 20, dict(lrate=0.01, hyper_dim=32, reg=0.1, drop_rate=0.2)),
]


@pytest.mark.parametrize(
    "name,epochs,kw", CASES, ids=[f"{c[0]}-{c[2].get('mode','d')}" for c in CASES]
)
def test_hd_model_learns(tiny_dataset, name, epochs, kw):
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
    assert result.best_metrics["recall"] > 0.12, (name, result.best_metrics)


def test_group_only_mode_runs(tiny_dataset):
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cfg = make_config(
        "HGNN_HD3", batch_size=512, hyper_dim=32, item_ranking=(10, 20),
        eval_user_batch=64, max_epoch=3, early_stopping_steps=5, mode="group_only",
    )
    cf = build_cf_device_data(inter, eval_user_multiple=64)
    trainer = Trainer(build_model(cfg, cf))
    result = trainer.fit(quiet=True)
    assert np.isfinite([r.losses["train_loss"] for r in result.history]).all()
