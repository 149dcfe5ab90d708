"""Standalone serving path: export round-trip, Retriever correctness
(vs numpy brute force), sharded-catalog equivalence, CLI smoke."""

import os

import numpy as np
import pytest

from hypergraph_diffusion_for_recommendation_tpu.core import make_config
from hypergraph_diffusion_for_recommendation_tpu.data import (
    build_cf_device_data,
    build_interaction,
)
from hypergraph_diffusion_for_recommendation_tpu.eval.serving import (
    Retriever,
    export_embeddings,
)
from hypergraph_diffusion_for_recommendation_tpu.models import (
    build_model,
    model_data_needs,
)
from hypergraph_diffusion_for_recommendation_tpu.train import Trainer


@pytest.fixture(scope="module")
def export_path(tiny_dataset, tmp_path_factory):
    """Train MF briefly, export, return (npz path, inter, numpy tables)."""
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cfg = make_config(
        "MF", batch_size=512, embedding_size=16, item_ranking=(10,),
        eval_user_batch=64, max_epoch=2, early_stopping_steps=5,
    )
    cf = build_cf_device_data(inter, eval_user_multiple=64, needs=model_data_needs("MF"))
    bundle = build_model(cfg, cf)
    trainer = Trainer(bundle)
    trainer.fit(quiet=True)
    u_emb, i_emb = bundle.encode_eval(trainer.params, trainer.extras)
    path = str(tmp_path_factory.mktemp("serve") / "embeddings.npz")
    export_embeddings(
        path, u_emb, i_emb, inter.id2user, inter.id2item,
        rated_pad=np.asarray(cf.rated_pad), meta={"model": "MF"},
    )
    return path, inter, np.asarray(u_emb), np.asarray(i_emb), np.asarray(cf.rated_pad)


def _brute_topk(u_emb, i_emb, rated_pad, dense_users, k, mask):
    scores = u_emb[dense_users] @ i_emb.T
    if mask:
        for b, u in enumerate(dense_users):
            rated = rated_pad[u]
            scores[b, rated[rated >= 0]] = -1e9
    ids = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return ids


def test_retriever_matches_bruteforce(export_path):
    path, inter, u_emb, i_emb, rated_pad = export_path
    r = Retriever.load(path, block=8)  # forces multi-block + tail padding
    assert r.meta["model"] == "MF"
    rng = np.random.default_rng(1)
    dense_users = rng.choice(inter.n_users, 13, replace=False)
    raw_users = inter.id2user[dense_users]

    for mask in (True, False):
        ids, scores = r.topk(raw_users, k=5, exclude_rated=mask, raw_ids=False)
        want = _brute_topk(u_emb, i_emb, rated_pad, dense_users, 5, mask)
        # compare by score (ties can reorder ids)
        got_s = np.take_along_axis(u_emb[dense_users] @ i_emb.T, ids, axis=1)
        want_s = np.take_along_axis(u_emb[dense_users] @ i_emb.T, want, axis=1)
        np.testing.assert_allclose(got_s, want_s, rtol=1e-5)
        if mask:  # no retrieved item may be in the user's history
            for b, u in enumerate(dense_users):
                rated = set(rated_pad[u][rated_pad[u] >= 0].tolist())
                assert not (set(ids[b].tolist()) & rated)

    # raw-id translation round-trips through id2item
    ids_raw, _ = r.topk(raw_users, k=5, raw_ids=True)
    ids_dense, _ = r.topk(raw_users, k=5, raw_ids=False)
    np.testing.assert_array_equal(ids_raw, inter.id2item[ids_dense])


def test_unknown_user_raises(export_path):
    path, inter, *_ = export_path
    r = Retriever.load(path)
    bad = int(np.asarray(inter.id2user).max()) + 999
    with pytest.raises(KeyError):
        r.topk([bad], k=3)


@pytest.mark.slow
def test_sharded_retriever_matches_single(export_path):
    from hypergraph_diffusion_for_recommendation_tpu.parallel import make_mesh

    path, inter, *_ = export_path
    raw_users = inter.id2user[np.arange(min(24, inter.n_users))]
    single = Retriever.load(path, block=16)
    sharded = Retriever.load(path, mesh=make_mesh(1, 8), block=16)
    for mask in (True, False):
        ids1, s1 = single.topk(raw_users, k=7, exclude_rated=mask)
        ids2, s2 = sharded.topk(raw_users, k=7, exclude_rated=mask)
        np.testing.assert_allclose(s1, s2, rtol=1e-5)
        # score-equal sets may permute; compare as sorted pairs
        np.testing.assert_allclose(np.sort(s1, axis=1), np.sort(s2, axis=1), rtol=1e-5)
        assert (ids1 == ids2).mean() > 0.9  # identical up to rare ties


def test_serving_cli(export_path, tmp_path):
    from hypergraph_diffusion_for_recommendation_tpu.serving_cli import main

    path, inter, *_ = export_path
    users = ",".join(str(int(u)) for u in inter.id2user[:3])
    out = str(tmp_path / "recs.tsv")
    assert main(["--embeddings", path, "--users", users, "--k", "4", "--out", out]) == 0
    rows = [line.split("\t") for line in open(out).read().strip().split("\n")]
    assert len(rows) == 12  # 3 users x k=4
    assert [r[1] for r in rows[:4]] == ["1", "2", "3", "4"]  # ranks
    item_vocab = set(int(i) for i in inter.id2item)
    assert all(int(r[2]) in item_vocab for r in rows)
