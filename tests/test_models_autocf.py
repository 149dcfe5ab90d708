"""AutoCF / LRMRec (graph masked autoencoder) tests."""

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


@pytest.mark.parametrize("name", ["AutoCF", "LRMRec"])
def test_autocf_family_learns(tiny_dataset, name):
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cfg = make_config(
        name, batch_size=512, embedding_size=32, item_ranking=(10, 20),
        eval_user_batch=64, max_epoch=10, early_stopping_steps=10,
        lrate=0.01, reg=0.1,
    )
    cf = build_cf_device_data(inter, eval_user_multiple=64)
    r = Trainer(build_model(cfg, cf)).fit(quiet=True)
    losses = [h.losses["train_loss"] for h in r.history]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert r.best_metrics["recall"] > 0.15, (name, r.best_metrics)
