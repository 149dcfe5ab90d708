"""KGIN / KGCL / KTUP / RippleNet tests."""

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
    build_kg_device_data,
    build_knowledge,
)
from hypergraph_diffusion_for_recommendation_tpu.models import build_model
from hypergraph_diffusion_for_recommendation_tpu.train import Trainer


@pytest.fixture(scope="module")
def kg_setup(tiny_kg_dataset):
    train, test, kg_df = tiny_kg_dataset
    inter = build_interaction(train, test)
    kg = build_knowledge(kg_df, inter)
    return build_cf_device_data(inter, eval_user_multiple=64), build_kg_device_data(kg)


CASES = [
    ("KGIN", 20, 0.12, dict(lrate=0.05, cl_rate=0.01)),
    ("KGCL", 20, 0.12, dict(lrate=0.05, cl_rate=0.01, temp=0.2, drop_rate=0.2)),
    ("KTUP", 20, 0.05, dict(lrate=0.05, alpha=0.5)),
    ("HKGRippleNet", 20, 0.05, dict(lrate=0.05)),
]


@pytest.mark.parametrize("name,epochs,floor,kw", CASES, ids=[c[0] for c in CASES])
def test_kg_extra_models(kg_setup, name, epochs, floor, kw):
    cf_dev, kg_dev = kg_setup
    cfg = make_config(
        name, batch_size=512, batch_size_kg=512, embedding_size=32,
        relation_dim=32, item_ranking=(10, 20), eval_user_batch=64,
        max_epoch=epochs, early_stopping_steps=epochs, use_knowledge=True, **kw,
    )
    bundle = build_model(cfg, cf_dev, kg_dev)
    r = Trainer(bundle).fit(quiet=True)
    losses = [h.losses["train_loss"] for h in r.history]
    assert np.isfinite(losses).all(), (name, losses)
    assert losses[-1] < losses[0], (name, losses)
    assert r.best_metrics["recall"] > floor, (name, r.best_metrics)
