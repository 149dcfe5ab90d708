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


def test_kg_subset_and_graph_utils(tmp_path):
    """KG-linking capability parity (conversion_tools/add_knowledge.py):
    n-hop frontier expansion from linked item entities."""
    import os

    import numpy as np

    from hypergraph_diffusion_for_recommendation_tpu.utils import dataset_tools as dt

    d = str(tmp_path)
    inter = os.path.join(d, "inter.txt")
    with open(inter, "w") as fp:
        fp.write("user\titem\trating\n")
        fp.write("1\t10\t1\n2\t11\t1\n3\t99\t1\n")
    link = os.path.join(d, "links.tsv")
    with open(link, "w") as fp:
        fp.write("item_id:token\tentity_id:token\n")
        fp.write("10\te10\n11\te11\n55\te55\n")  # 55 not in interactions
    kg = os.path.join(d, "full.kg")
    with open(kg, "w") as fp:
        fp.write("e10\tr1\te20\n")   # hop 1 (seed e10)
        fp.write("e20\tr1\te30\n")   # hop 2 (via e20)
        fp.write("e30\tr1\te40\n")   # hop 3
        fp.write("e55\tr1\te56\n")   # only reachable from non-seed e55
    n_links, n1 = dt.make_kg_subset(inter, kg, link, os.path.join(d, "out1"), hop=1)
    assert n_links == 2  # item 55's link filtered out
    assert n1 == 1
    lines1 = open(os.path.join(d, "out1.kg")).read().splitlines()
    assert lines1 == ["e10\tr1\te20"]
    _, n2 = dt.make_kg_subset(inter, kg, link, os.path.join(d, "out2"), hop=2)
    assert n2 == 2  # frontier e20 pulls the second triple

    # merge + shuffle utilities
    e1 = os.path.join(d, "a.edgelist"); e2 = os.path.join(d, "b.edgelist")
    open(e1, "w").write("1 2\n2 3\n")
    open(e2, "w").write("2 3\n3 4\n")
    n = dt.merge_edgelists([e1, e2], os.path.join(d, "m.edgelist"))
    assert n == 3
    dt.shuffle_interactions(inter, os.path.join(d, "sh.txt"), seed=1)
    sh = open(os.path.join(d, "sh.txt")).read().splitlines()
    assert sh[0].startswith("user") and sorted(sh[1:]) == sorted(open(inter).read().splitlines()[1:])


def test_results_aggregator(tmp_path):
    """generate_output.ipynb parity: per-run CSVs -> flat output.csv."""
    import csv

    from hypergraph_diffusion_for_recommendation_tpu.utils.results import (
        aggregate_results,
        write_output_csv,
    )

    run = tmp_path / "MF" / "lastfm" / "full@lr0.001-reg0.1-dim64-L2-seed0"
    run.mkdir(parents=True)
    (run / "final_metrics.csv").write_text(
        "topN,hit_ratio,precision,recall,ndcg\n"
        "10,0.1,0.2,0.3,0.4\n20,0.15,0.25,0.35,0.45\n"
    )
    unfinished = tmp_path / "LightGCN" / "lastfm" / "missing_10@lr0.01-reg0.1-dim64-L2-seed0"
    unfinished.mkdir(parents=True)
    (unfinished / "train_performance.csv").write_text(
        "epoch,train_time,test_time,hit@20,precision@20,recall@20,ndcg@20\n"
        "0,1.0,1.0,0.1,0.1,0.10,0.1\n1,1.0,1.0,0.2,0.2,0.30,0.2\n2,1.0,1.0,0.2,0.2,0.20,0.2\n"
    )
    rows = aggregate_results(str(tmp_path))
    assert len(rows) == 2
    by_model = {r["model"]: r for r in rows}
    assert by_model["MF"]["recall@20"] == 0.35
    assert by_model["MF"]["experiment"] == "full"
    # unfinished run: best-recall epoch row (epoch 1), not the last
    assert by_model["LightGCN"]["recall@20"] == 0.30
    assert by_model["LightGCN"]["best_epoch"] == 1
    assert by_model["LightGCN"]["experiment"] == "missing_10"

    out = tmp_path / "output.csv"
    write_output_csv(rows, str(out))
    got = list(csv.DictReader(open(out)))
    assert len(got) == 2 and got[0]["model"] == "LightGCN"


def test_hierarchical_synthetic_regime():
    """hierarchy=(C, F) plants a two-level tree: a user's edges must
    concentrate in ONE coarse family (the confound the regime is built
    on), and the flat rng stream stays untouched when hierarchy=None."""
    import numpy as np

    from hypergraph_diffusion_for_recommendation_tpu.data import synthetic_dataset
    from hypergraph_diffusion_for_recommendation_tpu.data.synthetic import _item_clusters

    C, F = 4, 4
    train, test, _ = synthetic_dataset(
        n_users=80, n_items=400, mean_degree=12.0, seed=5,
        hierarchy=(C, F), affinity=10.0, sibling_affinity=7.0,
    )
    fine = _item_clusters(400, C * F, 5)
    coarse = fine // F
    pairs = np.concatenate([train, test])
    users = np.unique(pairs[:, 0])
    fracs = []
    for u in users:
        cc = coarse[pairs[pairs[:, 0] == u, 1]]
        fracs.append(np.bincount(cc, minlength=C).max() / len(cc))
    # majority coarse-family share far above the 1/C = 0.25 baseline
    assert np.mean(fracs) > 0.5, np.mean(fracs)

    # flat regime bit-identical to the historical stream
    a1, b1, _ = synthetic_dataset(n_users=40, n_items=120, mean_degree=8.0, seed=3)
    a2, b2, _ = synthetic_dataset(
        n_users=40, n_items=120, mean_degree=8.0, seed=3, hierarchy=None
    )
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(b1, b2)


def test_cost_analysis_reports_flops():
    """XLA cost analysis replaces the reference's hand-rolled MLP FLOPs
    estimator (model/layers/MLP.py:119-134) for ANY jittable fn."""
    import jax.numpy as jnp

    from hypergraph_diffusion_for_recommendation_tpu.utils.profiling import (
        cost_analysis,
        flops_estimate,
    )

    def f(a, b):
        return (a @ b).sum()

    import jax

    a = jax.ShapeDtypeStruct((64, 128), jnp.float32)
    b = jax.ShapeDtypeStruct((128, 32), jnp.float32)
    fl = flops_estimate(f, a, b)
    # matmul flops = 2*M*K*N (+ reduction); must be in the right ballpark
    assert fl >= 2 * 64 * 128 * 32 * 0.9, fl
    stats = cost_analysis(f, a, b)
    assert "flops" in stats


def test_cost_analysis_never_materialises_closure_consts():
    """Regression: lowering a fn that closes over device arrays must NOT
    pull them host-side as MLIR constants (on the tunnelled TPU backend
    that is a minutes-long device->host transfer that wedged the bench;
    BENCH_NOTES round 2 'lowering wedge')."""
    import jax
    import jax.numpy as jnp

    from hypergraph_diffusion_for_recommendation_tpu.utils.profiling import (
        cost_analysis,
    )

    big = jnp.ones((512, 512), jnp.float32)  # closed-over device array

    def f(x):
        return (x @ big).sum()

    from jax._src import array as _array_mod

    pulled = []
    orig = _array_mod.ArrayImpl._value

    class _Guard:
        def __get__(self, obj, objtype=None):
            pulled.append(obj.shape)
            return orig.__get__(obj, objtype)

    _array_mod.ArrayImpl._value = _Guard()
    try:
        stats = cost_analysis(f, jax.ShapeDtypeStruct((8, 512), jnp.float32))
    finally:
        _array_mod.ArrayImpl._value = orig
    assert "flops" in stats
    assert not any(s == (512, 512) for s in pulled), pulled


def test_bench_supervisor_kills_and_retries(tmp_path):
    """bench.py's compile-lottery supervisor: a deadline expiry kills the
    child's exact process group and the next attempt runs fresh."""
    import subprocess
    import sys

    import bench

    # stub child: first invocation sleeps past the deadline, second exits 0
    marker = tmp_path / "ran_once"
    stub = tmp_path / "child.py"
    stub.write_text(
        "import pathlib, sys, time\n"
        f"m = pathlib.Path({str(marker)!r})\n"
        "if m.exists():\n"
        "    sys.exit(0)\n"
        "m.touch()\n"
        "time.sleep(60)\n"
    )

    calls = []
    real_popen = subprocess.Popen

    def popen(cmd, **kw):
        calls.append(cmd)
        # -S skips the axon sitecustomize (several seconds of startup)
        return real_popen([sys.executable, "-S", str(stub)], **kw)

    subprocess.Popen = popen
    try:
        rc = bench.supervise([], deadlines=(8.0, 60.0))
    finally:
        subprocess.Popen = real_popen
    assert rc == 0
    assert len(calls) == 2
    assert "--child" in calls[0]
