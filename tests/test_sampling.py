"""On-device sampler tests."""

import numpy as np
import jax

from hypergraph_diffusion_for_recommendation_tpu.data import (
    build_cf_device_data,
    build_interaction,
)
from hypergraph_diffusion_for_recommendation_tpu.ops.sampling import (
    epoch_pairwise_batches,
    is_rated,
    sample_negatives,
)


def test_negatives_avoid_history(tiny_dataset):
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    dev = build_cf_device_data(inter)
    rng = jax.random.PRNGKey(0)
    users = dev.edge_u[:512]
    negs = sample_negatives(rng, users, dev.rated_pad, inter.n_items, rounds=8)
    bad = np.asarray(is_rated(dev.rated_pad, users, negs))
    assert bad.sum() == 0
    negs_np = np.asarray(negs)
    assert negs_np.min() >= 0 and negs_np.max() < inter.n_items


def test_epoch_batches_cover_all_edges(tiny_dataset):
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    dev = build_cf_device_data(inter)
    B = 256
    users, pos, neg = epoch_pairwise_batches(
        jax.random.PRNGKey(1), dev.edge_u, dev.edge_i, dev.rated_pad, inter.n_items, B
    )
    n = inter.n_cf_train
    n_batches = -(-n // B)
    assert users.shape == (n_batches, B) == pos.shape == neg.shape
    # every true edge appears at least once (wrap-fill duplicates allowed)
    seen = set(zip(np.asarray(users).ravel().tolist(), np.asarray(pos).ravel().tolist()))
    want = set(zip(np.asarray(dev.edge_u).tolist(), np.asarray(dev.edge_i).tolist()))
    assert want <= seen
    # negatives never in history
    bad = np.asarray(
        is_rated(dev.rated_pad, users.reshape(-1), neg.reshape(-1))
    )
    assert bad.mean() < 1e-3


def test_epoch_batches_shuffle_differs_by_seed(tiny_dataset):
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    dev = build_cf_device_data(inter)
    u1, _, _ = epoch_pairwise_batches(
        jax.random.PRNGKey(1), dev.edge_u, dev.edge_i, dev.rated_pad, inter.n_items, 128
    )
    u2, _, _ = epoch_pairwise_batches(
        jax.random.PRNGKey(2), dev.edge_u, dev.edge_i, dev.rated_pad, inter.n_items, 128
    )
    assert not np.array_equal(np.asarray(u1), np.asarray(u2))


def test_csr_membership_matches_padded(tiny_dataset):
    from hypergraph_diffusion_for_recommendation_tpu.ops.sampling import (
        CSRMembership,
        membership_from_lists,
    )

    train, test = tiny_dataset
    inter = build_interaction(train, test)
    dev = build_cf_device_data(inter)
    assert isinstance(dev.rated_csr, CSRMembership)
    rng = np.random.default_rng(3)
    users = rng.integers(0, inter.n_users, size=4096).astype(np.int32)
    cands = rng.integers(0, inter.n_items, size=4096).astype(np.int32)
    # force half the candidates to be true members
    rated = inter.rated_lists()
    for k in range(0, 4096, 2):
        row = rated[users[k]]
        if len(row):
            cands[k] = row[rng.integers(len(row))]
    got_csr = np.asarray(is_rated(dev.rated_csr, users, cands))
    got_pad = np.asarray(is_rated(dev.rated_pad, users, cands))
    assert np.array_equal(got_csr, got_pad)
    # empty-row handling: a user id past the table end of lists
    empty = membership_from_lists([np.empty(0, np.int64), np.array([5, 1])])
    got = np.asarray(
        is_rated(empty, np.array([0, 1, 1], np.int32), np.array([5, 5, 2], np.int32))
    )
    assert got.tolist() == [False, True, False]


def test_negatives_avoid_history_csr(tiny_dataset):
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    dev = build_cf_device_data(inter)
    rng = jax.random.PRNGKey(0)
    users = dev.edge_u[:512]
    negs = sample_negatives(rng, users, dev.rated_csr, inter.n_items, rounds=8)
    bad = np.asarray(is_rated(dev.rated_pad, users, negs))
    assert bad.sum() == 0


# ---------------------------------------------------------------------------
# --sampler=exact: host-side reference-semantics rejection sampler
# (VERDICT r3 #1 A/B control)

def test_host_exact_sampler_pairwise(tiny_dataset):
    from hypergraph_diffusion_for_recommendation_tpu.ops.sampling import (
        HostExactSampler,
    )

    train, test = tiny_dataset
    inter = build_interaction(train, test)
    s = HostExactSampler(inter.train_u, inter.train_i, inter.n_items)
    users, pos, neg = s.pairwise(seed=7, batch_size=256)
    n = inter.train_u.shape[0]
    assert users.shape == pos.shape == neg.shape
    assert users.shape[0] == -(-n // 256) and users.shape[1] == 256
    hist = {}
    for u, i in zip(inter.train_u.tolist(), inter.train_i.tolist()):
        hist.setdefault(u, set()).add(i)
    for u, p, ng in zip(users.ravel().tolist(), pos.ravel().tolist(),
                        neg.ravel().tolist()):
        assert p in hist[u]          # positives are real edges
        assert ng not in hist[u]     # negatives NEVER in history (exact)
        assert 0 <= ng < inter.n_items
    # deterministic per seed
    again = s.pairwise(seed=7, batch_size=256)
    assert all(np.array_equal(a, b) for a, b in zip((users, pos, neg), again))
    other = s.pairwise(seed=8, batch_size=256)
    assert not np.array_equal(neg, other[2])


def test_host_exact_sampler_kg(tiny_kg_dataset):
    from hypergraph_diffusion_for_recommendation_tpu.data import (
        build_interaction as bi,
        build_knowledge,
    )
    from hypergraph_diffusion_for_recommendation_tpu.ops.sampling import (
        HostExactSampler,
    )

    train, test, kg_df = tiny_kg_dataset
    inter = bi(train, test)
    kg = build_knowledge(kg_df, inter)
    heads = kg.h[: kg.n_kg_train]
    rels = kg.r[: kg.n_kg_train]
    tails = kg.t[: kg.n_kg_train]
    s = HostExactSampler(
        inter.train_u, inter.train_i, inter.n_items,
        kg_heads=heads, kg_relations=rels, kg_tails=tails,
        n_entities=kg.n_entities,
    )
    hh, rr, pt, nt = s.kg_batches(seed=5, n_batches=4, batch_size_kg=128)
    assert hh.shape == (4, 128) and nt.shape == (4, 128)
    true_tails = {}
    for a, b in zip(heads.tolist(), tails.tolist()):
        true_tails.setdefault(a, set()).add(b)
    for a, b in zip(hh.ravel().tolist(), nt.ravel().tolist()):
        assert b not in true_tails.get(a, set())
        assert 0 <= b < kg.n_entities


def test_trainer_exact_sampler_trains(tiny_dataset):
    """--sampler=exact end-to-end: LightGCN trains a few epochs through
    the host-batch chunked path and produces finite, improving loss."""
    from hypergraph_diffusion_for_recommendation_tpu.core import make_config
    from hypergraph_diffusion_for_recommendation_tpu.models import build_model
    from hypergraph_diffusion_for_recommendation_tpu.train import Trainer

    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cf = build_cf_device_data(inter, eval_user_multiple=64)
    cfg = make_config("LightGCN", batch_size=512, max_epoch=3,
                      sampler="exact", item_ranking=(10, 20))
    bundle = build_model(cfg, cf, None)
    assert bundle.lr_plateau is False  # LightGCN.py:37 — no scheduler
    tr = Trainer(bundle)
    assert tr._chunk_steps  # host batches ride the chunked path
    losses = [tr.run_epoch(e)[0] for e in range(3)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_lr_plateau_and_patience_flags(tiny_dataset):
    """Reference-parity trainer behavior flags: LightGCN (no scheduler in
    LightGCN.py) must not anneal; self-att bundles (HGNN) double their
    early-stop patience (round-3 seed-outlier root cause)."""
    from hypergraph_diffusion_for_recommendation_tpu.core import make_config
    from hypergraph_diffusion_for_recommendation_tpu.models import build_model

    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cf = build_cf_device_data(inter, eval_user_multiple=64)
    lg = build_model(make_config("LightGCN", batch_size=512, max_epoch=1), cf, None)
    assert lg.lr_plateau is False and lg.early_stop_patience_scale == 1
    sgl = build_model(make_config("SGL", batch_size=512, max_epoch=1), cf, None)
    assert sgl.lr_plateau is False
    hccf = build_model(make_config("HCCF", batch_size=512, max_epoch=1), cf, None)
    assert hccf.lr_plateau is True  # HCCF.py steps ReduceLROnPlateau
