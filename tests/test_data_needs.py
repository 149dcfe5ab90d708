"""Per-model device-data needs: table-sync + functional tests."""

import pytest

# per-model learning tests (many training epochs on the virtual CPU
# mesh) live in the slow tier; `pytest -q -m slow` runs them
pytestmark = pytest.mark.slow

import os
import re

import numpy as np

from hypergraph_diffusion_for_recommendation_tpu.core import make_config
from hypergraph_diffusion_for_recommendation_tpu.data import (
    build_cf_device_data,
    build_interaction,
)
from hypergraph_diffusion_for_recommendation_tpu.models import (
    MODEL_REGISTRY,
    build_model,
    model_data_needs,
)
from hypergraph_diffusion_for_recommendation_tpu.train import Trainer

_FIELDS = r"adj|int_norm|inv_int_norm|b_hyper|raw_int|raw_adj|bip_src"


def test_needs_table_covers_actual_field_usage():
    """Every `cf.<field>` read in a model module must be declared in
    _MODULE_DATA_NEEDS (bip_src rides raw_adj; raw_int is implied by
    raw_adj), and every registered module must have an entry."""
    import inspect

    import hypergraph_diffusion_for_recommendation_tpu.models as M
    from hypergraph_diffusion_for_recommendation_tpu.models.base import (
        _MODULE_DATA_NEEDS,
    )

    pkgdir = os.path.dirname(M.__file__)
    registered_modules = {
        inspect.getmodule(fn).__name__.rsplit(".", 1)[-1]
        for fn in MODEL_REGISTRY.values()
    }
    missing = registered_modules - set(_MODULE_DATA_NEEDS)
    assert not missing, f"modules without a needs entry: {missing}"

    for mod, needs in _MODULE_DATA_NEEDS.items():
        src = open(os.path.join(pkgdir, f"{mod}.py")).read()
        used = set(re.findall(rf"cf\.({_FIELDS})\b", src))
        used = {("raw_adj" if u == "bip_src" else u) for u in used}
        allowed = set(needs) | ({"raw_int"} if "raw_adj" in needs else set())
        assert used <= allowed, (mod, used, needs)
        # and no stale over-declaration
        assert set(needs) <= used | ({"raw_int"} if "raw_adj" in needs else set()), (
            mod, used, needs,
        )


def test_needs_based_build_trains(tiny_dataset):
    """Models built on a needs-trimmed CFDeviceData (unused adjacency
    representations = None) must train and evaluate normally."""
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    for model in ("LightGCN", "SGL", "HGNN_HD3", "MF"):
        needs = model_data_needs(model)
        assert needs is not None
        cfg = make_config(
            model, batch_size=512, embedding_size=16, hyper_dim=16,
            item_ranking=(10,), eval_user_batch=64, max_epoch=2,
            early_stopping_steps=5,
        )
        cf = build_cf_device_data(inter, eval_user_multiple=64, needs=needs)
        # trimmed fields really are absent
        if "b_hyper" not in needs:
            assert cf.b_hyper is None
        if "raw_adj" not in needs:
            assert cf.raw_adj is None
        res = Trainer(build_model(cfg, cf)).fit(quiet=True)
        assert len(res.history) == 2
        assert np.isfinite(res.history[-1].losses["train_loss"])
