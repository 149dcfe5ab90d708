"""Conf parity parsers + dataset-prep tooling tests."""

import os

import numpy as np


def test_modelconf_optionconf_parse(tmp_path):
    from hypergraph_diffusion_for_recommendation_tpu.utils.conf import (
        ModelConf,
        OptionConf,
        config_from_conf,
    )

    conf = tmp_path / "LightGCN.conf"
    conf.write_text(
        "training.set=train.txt \n"
        "model.name=LightGCN\n"
        "item.ranking=-topN 10,20\n"
        "embedding.size=32\n"
        "num.max.epoch=500\n"
        "batch_size=2048\n"
        "learnRate=0.001\n"
        "reg.lambda=0.1\n"
        "LightGCN=-n_layer 2\n"
        "gnn_layer=2\n"
        "learnRateDecay=0.9\n"
        "use.knowledge=false\n"
    )
    mc = ModelConf(str(conf))
    assert mc["model.name"] == "LightGCN"
    oc = OptionConf(mc["LightGCN"])
    assert oc["-n_layer"] == "2"

    cfg = config_from_conf(str(conf))
    assert cfg.model == "LightGCN"
    assert cfg.embedding_size == 32
    assert cfg.lrate == 0.001
    assert cfg.reg == 0.1
    assert cfg.item_ranking == (10, 20)
    assert not cfg.use_knowledge
    # overrides win
    cfg2 = config_from_conf(str(conf), lrate=0.05)
    assert cfg2.lrate == 0.05

    # the real reference conf files parse too
    ref = "/root/reference/HD_SELFRec/conf/KHGRec.conf"
    if os.path.exists(ref):
        cfg3 = config_from_conf(ref)
        assert cfg3.model == "KHGRec"
        assert cfg3.hyper_dim == 128
        assert cfg3.use_knowledge


def test_dataset_tools_roundtrip(tmp_path):
    from hypergraph_diffusion_for_recommendation_tpu.data import synthetic_dataset
    from hypergraph_diffusion_for_recommendation_tpu.data.io import (
        load_data_set,
        write_interactions,
    )
    from hypergraph_diffusion_for_recommendation_tpu.utils import dataset_tools as dt

    train, test, _ = synthetic_dataset(n_users=60, n_items=150, mean_degree=12.0, seed=5)
    base = np.concatenate([train, test])
    d = str(tmp_path)
    write_interactions(os.path.join(d, "ratings.txt"), base)

    dt.make_split_files(d)
    tr = load_data_set(os.path.join(d, "train.txt"))
    te = load_data_set(os.path.join(d, "test.txt"))
    assert len(tr) == int(len(base) * 0.75)
    assert len(tr) + len(te) == len(base)

    dt.make_missing_files(d, pcts=(10,))
    tr10 = load_data_set(os.path.join(d, "missing", "train_10.txt"))
    assert len(tr10) == len(tr) - int(len(base) * 0.10)

    dt.make_coldstart_files(d)
    for g in (1, 2, 3, 4):
        assert os.path.exists(os.path.join(d, "cold-start", f"test_group_{g}.txt"))

    dt.make_noise_files(d, pcts=(10,))
    trn = load_data_set(os.path.join(d, "add_noise", "train_10.txt"))
    assert len(trn) == len(tr)

    dt.export_edgelist(tr, os.path.join(d, "edgelist", "interaction.edgelist"))
    dt.export_graphsage_json(tr, os.path.join(d, "graphsage"))
    import json

    g = json.load(open(os.path.join(d, "graphsage", "interaction-G.json")))
    assert len(g["links"]) == len(tr)
