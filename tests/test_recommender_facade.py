"""Reference-style Recommender facade tests."""

import os

import numpy as np


def test_facade_execute_predict_dump(tmp_path, tiny_dataset):
    from hypergraph_diffusion_for_recommendation_tpu.core import make_config
    from hypergraph_diffusion_for_recommendation_tpu.data.io import write_interactions
    from hypergraph_diffusion_for_recommendation_tpu.train import Recommender

    train, test = tiny_dataset
    ddir = tmp_path / "dataset" / "tiny"
    write_interactions(str(ddir / "train.txt"), train)
    write_interactions(str(ddir / "test.txt"), test)

    cfg = make_config(
        "MF", dataset="tiny", data_dir=str(tmp_path / "dataset"),
        batch_size=256, max_epoch=10, early_stopping_steps=10, lrate=0.05,
        item_ranking=(10, 20), eval_user_batch=64,
        output_dir=str(tmp_path / "results"), log_dir=str(tmp_path / "log"),
    )
    rec = Recommender(cfg)
    metrics = rec.execute(quiet=True)
    assert metrics[20]["recall"] > 0.1

    raw_u = int(train[0, 0])
    scores = rec.predict(raw_u)
    assert scores.shape == (rec.inter.n_items,)
    top = rec.recommend(raw_u, k=5)
    assert len(top) == 5
    # recommended items exclude the training history
    rated_raw = {int(train[k, 1]) for k in range(len(train)) if int(train[k, 0]) == raw_u}
    assert not ({t[0] for t in top} & rated_raw)

    path = rec.dump_recommendations()
    assert os.path.exists(path)
    first = open(path).read().splitlines()
    assert first[0].startswith("userId:")
    assert len(first) == rec.cf_dev.eval_data.n_test_users + 1
