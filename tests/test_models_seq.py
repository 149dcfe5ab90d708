"""Sequential family tests (SASRec, CL4SRec)."""

import numpy as np
import pytest

from hypergraph_diffusion_for_recommendation_tpu.core import make_config
from hypergraph_diffusion_for_recommendation_tpu.data import (
    build_cf_device_data,
    build_interaction,
)
from hypergraph_diffusion_for_recommendation_tpu.models import build_model
from hypergraph_diffusion_for_recommendation_tpu.train import Trainer


@pytest.mark.parametrize("name", ["SASRec", "CL4SRec"])
def test_sequential_learns(tiny_dataset, name):
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cfg = make_config(
        name, batch_size=64, embedding_size=32, n_layers=2, drop_rate=0.2,
        item_ranking=(10, 20), eval_user_batch=64, max_epoch=15,
        early_stopping_steps=15, lrate=0.001, cl_rate=0.1, temp=1.0,
    )
    cf = build_cf_device_data(inter, eval_user_multiple=64)
    bundle = build_model(cfg, cf)
    assert bundle.batch_kind == "sequence"
    r = Trainer(bundle).fit(quiet=True)
    losses = [h.losses["train_loss"] for h in r.history]
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0]
    assert r.best_metrics["recall"] > 0.15, (name, r.best_metrics)


def test_seq_window_semantics(tiny_dataset):
    from hypergraph_diffusion_for_recommendation_tpu.models.sasrec import build_seq_from_cf

    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cf = build_cf_device_data(inter)
    sd = build_seq_from_cf(cf, max_len=50)
    seq = np.asarray(sd.seq)
    y = np.asarray(sd.y)
    sl = np.asarray(sd.seq_len)
    valid = np.asarray(sd.seq_valid)
    # targets are the inputs shifted by one
    for k in np.where(valid)[0][:20]:
        assert np.array_equal(seq[k, 1 : sl[k]], y[k, : sl[k] - 1])
        assert (seq[k, : sl[k]] > 0).all()
        assert (seq[k, sl[k] :] == 0).all()
