"""SSL baseline family tests (DirectAU, SimGCL, XSimGCL, NCL, MixGCF, SSL4Rec)."""

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
    # (name, epochs, recall floor, overrides)
    ("DirectAU", 80, 0.20, dict(lrate=0.01, cl_rate=0.2)),
    ("SimGCL", 20, 0.12, dict(lrate=0.05, cl_rate=0.05, temp=0.2)),
    ("XSimGCL", 20, 0.12, dict(lrate=0.05, cl_rate=0.05, temp=0.2)),
    ("NCL", 20, 0.12, dict(lrate=0.05, cl_rate=1e-5, temp=0.2)),
    ("MixGCF", 20, 0.12, dict(lrate=0.05, reg=0.1)),
    # batch-softmax two-tower: weaker objective on the tiny benchmark
    ("SSL4Rec", 60, 0.10, dict(lrate=0.05, cl_rate=0.01, temp=1.0, drop_rate=0.2)),
]


@pytest.mark.parametrize("name,epochs,floor,kw", CASES, ids=[c[0] for c in CASES])
def test_ssl_family_learns(tiny_dataset, name, epochs, floor, kw):
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cfg = make_config(
        name, batch_size=512, embedding_size=32, item_ranking=(10, 20),
        eval_user_batch=64, max_epoch=epochs, early_stopping_steps=epochs, **kw,
    )
    cf = build_cf_device_data(inter, eval_user_multiple=64)
    r = Trainer(build_model(cfg, cf)).fit(quiet=True)
    losses = [h.losses["train_loss"] for h in r.history]
    assert np.isfinite(losses).all(), (name, losses)
    assert r.best_metrics["recall"] > floor, (name, r.best_metrics)


@pytest.mark.parametrize("name,floor", [("BUIR", 0.08), ("SelfCF", 0.25)])
def test_bootstrap_family_learns(tiny_dataset, name, floor):
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cfg = make_config(
        name, batch_size=512, embedding_size=32, item_ranking=(10, 20),
        eval_user_batch=64, max_epoch=30, early_stopping_steps=30,
    )
    cf = build_cf_device_data(inter, eval_user_multiple=64)
    r = Trainer(build_model(cfg, cf)).fit(quiet=True)
    assert np.isfinite([h.losses["train_loss"] for h in r.history]).all()
    assert r.best_metrics["recall"] > floor, (name, r.best_metrics)
