"""Standalone KG triple-embedding trainer tests."""

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
    cfg = KGEConfig(model=model, dim=32, lrate=0.01, batch_size=512, max_epoch=40)
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
