"""KG-augmented model tests (KGAT, KHGRec)."""

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


@pytest.fixture(scope="module")
def kg_setup(tiny_kg_dataset):
    train, test, kg_df = tiny_kg_dataset
    inter = build_interaction(train, test)
    kg = build_knowledge(kg_df, inter)
    cf_dev = build_cf_device_data(inter, eval_user_multiple=64)
    kg_dev = build_kg_device_data(kg)
    return inter, cf_dev, kg_dev


def test_knowledge_construction(tiny_kg_dataset):
    train, test, kg_df = tiny_kg_dataset
    inter = build_interaction(train, test)
    kg = build_knowledge(kg_df, inter)
    n_rel0 = int(kg_df["r"].max()) + 1
    # CF relations 0/1 exist, shifted KG relations start at 2
    assert 0 in set(kg.r.tolist()) and 1 in set(kg.r.tolist())
    assert kg.n_relations == 2 * n_rel0 + 2
    # triple count: (kg + inverse) shifted + unshifted inverse + 2 * cf
    assert kg.n_kg_train == 3 * len(kg_df) + 2 * inter.n_cf_train
    # user entity ids disjoint from item entity ids
    assert not (set(kg.user_entity_ids.tolist()) & set(kg.item_entity_ids.tolist()))


def test_kgat_learns(kg_setup):
    inter, cf_dev, kg_dev = kg_setup
    cfg = make_config(
        "KGAT", batch_size=512, batch_size_kg=1024, embedding_size=32,
        relation_dim=32, conv_dim_list=(32, 16), mess_dropout=(0.1, 0.1),
        item_ranking=(10, 20), eval_user_batch=64, max_epoch=20,
        early_stopping_steps=20, lrate=0.01,
    )
    bundle = build_model(cfg, cf_dev, kg_dev)
    assert bundle.alternating
    result = Trainer(bundle).fit(quiet=True)
    losses = [r.losses["train_loss"] for r in result.history]
    assert np.isfinite(losses).all(), losses
    assert result.best_metrics["recall"] > 0.12, result.best_metrics


def test_khgrec_learns(kg_setup):
    inter, cf_dev, kg_dev = kg_setup
    cfg = make_config(
        "KHGRec", batch_size=512, batch_size_kg=1024, hyper_dim=32,
        relation_dim=32, item_ranking=(10, 20), eval_user_batch=64,
        max_epoch=20, early_stopping_steps=20, lrate=0.005, temp=1.0,
        cl_rate=0.01, drop_rate=0.2, mode="full",
    )
    bundle = build_model(cfg, cf_dev, kg_dev)
    result = Trainer(bundle).fit(quiet=True)
    losses = [r.losses["train_loss"] for r in result.history]
    assert np.isfinite(losses).all(), losses
    assert result.best_metrics["recall"] > 0.12, result.best_metrics


def test_khgrec_modes_run(kg_setup):
    inter, cf_dev, kg_dev = kg_setup
    for mode in ("wossl", "woglobal"):
        cfg = make_config(
            "KHGRec", batch_size=512, batch_size_kg=512, hyper_dim=16,
            relation_dim=16, item_ranking=(10,), eval_user_batch=64,
            max_epoch=2, early_stopping_steps=5, mode=mode,
        )
        bundle = build_model(cfg, cf_dev, kg_dev)
        result = Trainer(bundle).fit(quiet=True)
        assert np.isfinite([r.losses["train_loss"] for r in result.history]).all()


def test_khgrec_chunked_epoch_matches_single(kg_setup):
    """Chunked execution must thread the per-step attention extras
    (_new_extras) identically to the single-execution scan."""
    import jax

    inter, cf_dev, kg_dev = kg_setup

    def run(chunk):
        cfg = make_config(
            "KHGRec", batch_size=256, batch_size_kg=512, hyper_dim=32,
            relation_dim=16, item_ranking=(10, 20), eval_user_batch=64,
            max_epoch=2, early_stopping_steps=5, scan_chunk_steps=chunk,
        )
        tr = Trainer(build_model(cfg, cf_dev, kg_dev), seed=5)
        losses = [tr.run_epoch(ep)[0] for ep in range(2)]
        return tr.params, tr.extras, losses, tr.n_batches

    p1, e1, l1, nb = run(0)
    p2, e2, l2, _ = run(max(nb // 2 - 1, 1))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(e1), jax.tree.leaves(e2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_per_relation_adjacency_and_laplacians(tiny_kg_dataset):
    """Parity with Knowledge.create_adjacency_dict / create_laplacian_dict
    (reference data/knowledge.py:159-196)."""
    import scipy.sparse as sp

    train, test, kg_df = tiny_kg_dataset
    inter = build_interaction(train, test)
    kg = build_knowledge(kg_df, inter)
    adjs = kg.adjacency_dict()
    assert set(adjs) == set(np.unique(kg.r).tolist())
    # per-relation triple counts add up, and each entry matches the triples
    total = sum(int(a.nnz) for a in adjs.values())
    # duplicate (h, r, t) triples collapse with summed weights in CSR
    assert total <= kg.n_kg_train
    r0 = int(np.unique(kg.r)[0])
    m = kg.r == r0
    want = sp.csr_matrix(
        (np.ones(int(m.sum()), np.float32), (kg.h[m], kg.t[m])),
        shape=(kg.n_entities, kg.n_entities),
    )
    assert (adjs[r0] != want).nnz == 0
    # random-walk laplacian rows sum to 1 (or 0 for empty rows)
    lap = kg.laplacian_dict("random-walk")[r0]
    rs = np.asarray(lap.sum(axis=1)).flatten()
    nz = rs[rs > 0]
    np.testing.assert_allclose(nz, np.ones_like(nz), rtol=1e-5)
    # symmetric variant is symmetric for a symmetric relation pattern
    sym = kg.laplacian_dict("symmetric")[r0]
    assert sym.shape == (kg.n_entities, kg.n_entities)


def test_kgat_chunked_alternating_matches_single(kg_setup):
    """Chunked alternating execution (per-phase masked scans) must match
    the single-execution KGAT epoch step-for-step."""
    import jax

    inter, cf_dev, kg_dev = kg_setup

    def run(chunk):
        cfg = make_config(
            "KGAT", batch_size=256, batch_size_kg=512, embedding_size=16,
            relation_dim=16, conv_dim_list=(16, 8), mess_dropout=(0.1, 0.1),
            item_ranking=(10, 20), eval_user_batch=64, max_epoch=2,
            early_stopping_steps=5, lrate=0.01, scan_chunk_steps=chunk,
        )
        tr = Trainer(build_model(cfg, cf_dev, kg_dev), seed=9)
        out = [tr.run_epoch(ep) for ep in range(2)]
        return tr.params, [o[0] for o in out], tr.n_batches

    p1, l1, nb = run(0)
    p2, l2, _ = run(max(nb // 2 - 1, 1))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_khgrec_joint_encode_matches_unfused(kg_setup):
    """The block-diagonal joint fast path must reproduce the unfused
    CF+KG encoder pair bit-for-bit at eval (keep_rate=1: the only
    intended divergence is the edge-dropout rng stream)."""
    import jax
    import jax.numpy as jnp

    from hypergraph_diffusion_for_recommendation_tpu.data.device import blockdiag_pair
    from hypergraph_diffusion_for_recommendation_tpu.models.khgrec import KHGRecModule

    inter, cf_dev, kg_dev = kg_setup
    module = KHGRecModule(
        kg_dev.n_entities, kg_dev.n_relations, cf_dev.n_users, 32, 16, 2, 0.3
    )
    joint = blockdiag_pair(cf_dev.adj, kg_dev.kg_adj)
    B = 64
    att0 = (
        jnp.arange(B, dtype=jnp.int32) % kg_dev.n_entities,
        (jnp.arange(B, dtype=jnp.int32) * 3) % kg_dev.n_entities,
        jnp.linspace(0.1, 1.0, B, dtype=jnp.float32),
    )
    rng = jax.random.PRNGKey(0)
    params = module.init(
        {"params": rng, "edges": rng}, cf_dev, kg_dev, att0, 1.0, False, True,
        joint_adj=joint,
    )
    out_j = module.apply(params, cf_dev, kg_dev, att0, 1.0, False, True, joint_adj=joint)
    out_u = module.apply(params, cf_dev, kg_dev, att0, 1.0, False, True)
    for a, b in zip(out_j, out_u):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)
