"""Golden-file loader tests on committed REAL-FORMAT fixture slices.

The sandbox has no network egress and neither repo ships the real
datasets (reference .gitignore excludes dataset/), so metric parity on
LastFM/ML-1M cannot be measured here (see BENCH_NOTES.md). These
fixtures freeze the exact on-disk formats the reference consumes
(data/loader.py:24-38 interactions with tab or comma and a header line;
:66-78 KG with RecBole-style `head_id:token` headers) so the ingestion
path is verified byte-for-byte against files shaped like the real ones.
The one-command reproduction harness is scripts/run_reference_matrix.py.
"""

import os

import numpy as np
import pandas as pd

from hypergraph_diffusion_for_recommendation_tpu.data.io import (
    load_data_set,
    load_kg_data,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_tab_separated_with_weights_golden():
    """LastFM HetRec shape: tab-separated, header, extra weight column
    (ignored; weight forced 1.0 per data/loader.py:35-36)."""
    got = load_data_set(os.path.join(FIX, "lastfm_slice_tab.txt"))
    want = np.array(
        [[2, 51], [2, 52], [3, 73], [3, 78], [4, 1001],
         [5, 51], [5, 78], [6, 52], [6, 73], [7, 1002]], np.int64
    )
    np.testing.assert_array_equal(got[:, :2], want)


def test_comma_separated_with_extras_golden():
    """ML-1M shape: comma-separated, header, rating+timestamp columns
    ignored."""
    got = load_data_set(os.path.join(FIX, "ml1m_slice_comma.txt"))
    want = np.array(
        [[1, 1193], [1, 661], [2, 1193], [2, 2355], [3, 3408],
         [4, 1193], [4, 661], [5, 2355]], np.int64
    )
    np.testing.assert_array_equal(got[:, :2], want)


def test_kg_recbole_header_golden():
    """`h r t` TSV with the RecBole `head_id:token` header line the
    reference's conversion tooling emits (load_kg_data skiprows=1)."""
    df = load_kg_data(os.path.join(FIX, "lastfm_slice.kg"))
    assert list(df.columns) == ["h", "r", "t"]
    want = pd.DataFrame(
        {"h": [51, 51, 52, 73, 78, 1001, 1002],
         "r": [0, 1, 0, 2, 0, 1, 2],
         "t": [18723, 20411, 18723, 19001, 18944, 20411, 19001]}
    )
    np.testing.assert_array_equal(df.to_numpy(), want.to_numpy())


def test_fixture_trains_end_to_end(tmp_path):
    """The fixture slice flows through the full pipeline: id mapping,
    device build, one MF epoch, eval — the real-data path minus the
    real data."""
    from hypergraph_diffusion_for_recommendation_tpu.core import make_config
    from hypergraph_diffusion_for_recommendation_tpu.data import (
        build_cf_device_data,
        build_interaction,
    )
    from hypergraph_diffusion_for_recommendation_tpu.models import build_model
    from hypergraph_diffusion_for_recommendation_tpu.train import Trainer

    pairs = load_data_set(os.path.join(FIX, "lastfm_slice_tab.txt"))
    inter = build_interaction(pairs[:8], pairs[8:])
    cf = build_cf_device_data(inter, eval_user_multiple=8)
    cfg = make_config("MF", batch_size=8, max_epoch=1, eval_user_batch=8,
                      item_ranking=(5,))
    t = Trainer(build_model(cfg, cf, None))
    loss, _ = t.run_epoch(0)
    assert np.isfinite(loss)
    m = t.evaluate()
    assert set(m[5]) == {"hit_ratio", "precision", "recall", "ndcg"}
