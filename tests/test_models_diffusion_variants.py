"""HCCF_diffusion / DHCF_diffusion / HGNN / HD2 / HGNNAblation tests."""

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


def _run_cf(name, tiny_dataset, epochs, **kw):
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cfg = make_config(
        name, batch_size=512, embedding_size=32, item_ranking=(10, 20),
        eval_user_batch=64, max_epoch=epochs, early_stopping_steps=epochs, **kw,
    )
    cf = build_cf_device_data(inter, eval_user_multiple=64)
    return Trainer(build_model(cfg, cf)).fit(quiet=True)


def test_hccf_diffusion_learns(tiny_dataset):
    r = _run_cf(
        "HCCF_diffusion", tiny_dataset, 30,
        lrate=0.001, cl_rate=1e-4, temp=0.2, hyper_dim=32, drop_rate=0.3,
    )
    assert np.isfinite([h.losses["train_loss"] for h in r.history]).all()
    assert r.best_metrics["recall"] > 0.10, r.best_metrics


def test_dhcf_diffusion_learns(tiny_dataset):
    r = _run_cf("DHCF_diffusion", tiny_dataset, 25, lrate=0.01, hyper_dim=32, reg=0.01)
    assert np.isfinite([h.losses["train_loss"] for h in r.history]).all()
    assert r.best_metrics["recall"] > 0.10, r.best_metrics


@pytest.fixture(scope="module")
def kg_setup(tiny_kg_dataset):
    train, test, kg_df = tiny_kg_dataset
    inter = build_interaction(train, test)
    kg = build_knowledge(kg_df, inter)
    return build_cf_device_data(inter, eval_user_multiple=64), build_kg_device_data(kg)


@pytest.mark.parametrize("name,mode", [("HGNN", "full"), ("HD2", "full"), ("HGNNAblation", "wohyper")])
def test_khgrec_family_variants_run(kg_setup, name, mode):
    cf_dev, kg_dev = kg_setup
    cfg = make_config(
        name, batch_size=512, batch_size_kg=512, hyper_dim=16, relation_dim=16,
        item_ranking=(10,), eval_user_batch=64, max_epoch=2,
        early_stopping_steps=5, mode=mode, use_knowledge=True,
    )
    bundle = build_model(cfg, cf_dev, kg_dev)
    r = Trainer(bundle).fit(quiet=True)
    assert np.isfinite([h.losses["train_loss"] for h in r.history]).all()
