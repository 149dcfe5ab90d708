"""Empirical Bayes-oracle ceiling for the planted-structure synthetic
(data/synthetic.py oracle_metrics — VERDICT r2 #2).

The oracle scores by the exact generative draw weight, so it must
dominate the popularity-only oracle, which must dominate chance; and the
latent prelude refactor must leave the historical rng streams untouched.
"""

import numpy as np

from hypergraph_diffusion_for_recommendation_tpu.data.synthetic import (
    oracle_metrics,
    synthetic_dataset,
)

KW = dict(n_users=300, n_items=400, n_clusters=8, mean_degree=20.0, seed=11)


def test_oracle_dominates_popularity_and_chance():
    train, test, _ = synthetic_dataset(**KW, with_kg=False)
    m = oracle_metrics(train, test, **KW, cluster_seed=KW["seed"], k=20)
    chance = 20.0 / KW["n_items"]
    # at this tiny catalog the Zipf head is fat, so popularity alone is
    # strong; the Bayes oracle must still clearly dominate it
    assert m["recall"] > 1.3 * m["recall_pop"], m
    assert m["recall_pop"] > 1.5 * chance, m
    # planted affinity 8 on 8 clusters: the Bayes scorer finds a large
    # share of the test items
    assert m["recall"] > 0.25, m
    # the posterior-predictive (train-only) ceiling sits between the
    # popularity oracle and the full-latent oracle
    assert m["recall_pop"] < m["recall_posterior"] <= m["recall"] * 1.01, m


def test_latent_prelude_stream_unchanged():
    """Golden checksums captured at the refactor that extracted
    `_latent_prelude` — verified then against files generated BEFORE the
    refactor (parity sandbox dataset, byte-identical). Any reordering of
    the generator's rng calls changes these."""
    train, test, _ = synthetic_dataset(**KW, with_kg=False)
    assert train.shape == (5141, 2) and test.shape == (1714, 2)
    assert int(train.sum()) % 1_000_003 == 844516
    assert int(test.sum()) % 1_000_003 == 270059
