"""Standalone KG triple-embedding trainer tests."""

import pytest

# per-model learning tests (many training epochs on the virtual CPU
# mesh) live in the slow tier; `pytest -q -m slow` runs them
pytestmark = pytest.mark.slow

import numpy as np
import pytest

from hypergraph_diffusion_for_recommendation_tpu.data.synthetic import generate_kg
from hypergraph_diffusion_for_recommendation_tpu.train.kg_embedding import (
    KGEConfig,
    KGEmbeddingTrainer,
    Measure,
)


@pytest.mark.parametrize("model", ["TransE", "DistMult", "RealE"])
def test_kge_learns_structure(model):
    # denser KG (several triples per item) so held-out completions are
    # inferable from cluster co-occurrence
    kg = generate_kg(
        n_items=400, n_clusters=8, n_attrs_per_cluster=4, seed=2, max_triples_per_item=8
    )
    tr = kg[["h", "r", "t"]].to_numpy()
    n_ent = int(max(tr[:, 0].max(), tr[:, 2].max())) + 1
    n_rel = int(tr[:, 1].max()) + 1
    # the ReAlE windowed scorer's sigmoid non-linearities (reference conf
    # defaults) compress gradients; it trains at a higher lr
    cfg = KGEConfig(
        model=model, dim=32, lrate=0.03 if model == "RealE" else 0.01,
        batch_size=512, max_epoch=40,
    )
    trainer = KGEmbeddingTrainer(tr, n_ent, n_rel, cfg)
    losses = [trainer.run_epoch() for _ in range(cfg.max_epoch)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    m = trainer.evaluate(max_triples=200)
    # random hit@10 over ~430 entities would be ~0.023; structure helps a lot
    assert m.hit10["fil"] > 0.15, (model, m.hit10)
    assert m.mrr["fil"] >= m.mrr["raw"] - 1e-9  # filtering can only improve


def test_measure_normalize():
    m = Measure()
    m.update_batch(np.array([1, 2, 10, 50]), "raw")
    m.normalize(4)
    assert abs(m.hit1["raw"] - 0.25) < 1e-9
    assert abs(m.hit10["raw"] - 0.75) < 1e-9
    assert abs(m.mr["raw"] - 15.75) < 1e-9


def test_reale_hyper_relational_arity3():
    """ReAlE on arity-3 tuples (the hyper-relational capability the
    reference's broken CLI advertised: DEFAULT_MAX_ARITY=6,
    test-by-arity). Planted structure: each tuple holds three entities
    of one cluster, so completions are inferable."""
    rng = np.random.default_rng(5)
    n_ent, n_clusters = 240, 8
    cluster = rng.integers(0, n_clusters, n_ent)
    members = [np.nonzero(cluster == c)[0] for c in range(n_clusters)]
    A = 6
    rows = []
    for _ in range(3000):
        c = rng.integers(0, n_clusters)
        e = rng.choice(members[c], 3, replace=False)
        row = [rng.integers(0, 2)] + list(e) + [-1] * (A - 3)
        rows.append(row)
    tuples = np.asarray(rows, np.int64)

    cfg = KGEConfig(model="RealE", dim=32, lrate=0.03, batch_size=512, max_epoch=30)
    tr = KGEmbeddingTrainer(None, n_ent, 2, cfg, tuples=tuples)
    losses = [tr.run_epoch() for _ in range(cfg.max_epoch)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    by_ar = tr.evaluate(max_triples=150, by_arity=True)
    assert set(by_ar) == {3}
    # random hit@10 ~ 10/240 = 0.042; cluster structure must beat it clearly
    assert by_ar[3].hit10["fil"] > 0.15, by_ar[3].hit10
