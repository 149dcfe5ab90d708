"""Social data path + MHCN / SEPT tests."""

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
from hypergraph_diffusion_for_recommendation_tpu.data.social import (
    build_social,
    synthetic_social,
)
from hypergraph_diffusion_for_recommendation_tpu.models import build_model
from hypergraph_diffusion_for_recommendation_tpu.train import Trainer


@pytest.fixture(scope="module")
def social_setup(tiny_dataset):
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cf = build_cf_device_data(inter, eval_user_multiple=64)
    rel = synthetic_social(inter, n_per_user=5)
    social = build_social(rel, inter)
    return inter, cf, social


def test_relation_semantics(social_setup):
    inter, cf, social = social_setup
    assert social.social_mat.shape == (inter.n_users, inter.n_users)
    assert social.n_relations > 0
    bi = social.bidirectional_mat()
    # mutual matrix is symmetric and a subset of the directed one
    assert (bi != bi.T).nnz == 0
    assert bi.nnz <= social.social_mat.nnz
    # unknown users are dropped
    rel_bad = np.array([[999999, 999998]])
    s2 = build_social(rel_bad, inter)
    assert s2.n_relations == 0


@pytest.mark.parametrize("name", ["MHCN", "SEPT"])
def test_social_model_learns(social_setup, name):
    inter, cf, social = social_setup
    cfg = make_config(
        name, batch_size=512, embedding_size=32, item_ranking=(10, 20),
        eval_user_batch=64, max_epoch=20, early_stopping_steps=20,
        lrate=0.05, cl_rate=0.01, temp=0.2, reg=0.1, n_layers=2,
    )
    bundle = build_model(cfg, cf, social=social)
    r = Trainer(bundle).fit(quiet=True)
    losses = [h.losses["train_loss"] for h in r.history]
    assert np.isfinite(losses).all(), losses
    assert r.best_metrics["recall"] > 0.12, (name, r.best_metrics)
