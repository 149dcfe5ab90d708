"""Similarity helpers: batched device forms vs per-pair reference
semantics (util/algorithm.py:6-121 parity, incl. the quirky fallbacks)."""

import numpy as np
import pytest

from hypergraph_diffusion_for_recommendation_tpu.utils.similarity import (
    cosine,
    cosine_matrix,
    cosine_sp,
    euclidean,
    euclidean_sp,
    pearson,
    pearson_matrix,
    pearson_sp,
    similarity,
)


@pytest.fixture(scope="module")
def vecs(rng):
    return rng.standard_normal((6, 12)), rng.standard_normal((4, 12))


def test_batched_matches_per_pair(vecs):
    x, y = vecs
    cm = np.asarray(cosine_matrix(x, y))
    pm = np.asarray(pearson_matrix(x, y))
    for i in range(x.shape[0]):
        for j in range(y.shape[0]):
            assert cm[i, j] == pytest.approx(cosine(x[i], y[j]), abs=1e-5)
            assert pm[i, j] == pytest.approx(pearson(x[i], y[j]), abs=1e-5)


def test_self_similarity_diagonal(vecs):
    x, _ = vecs
    cm = np.asarray(cosine_matrix(x))
    np.testing.assert_allclose(np.diag(cm), 1.0, atol=1e-5)


def test_zero_vector_fallbacks():
    z = np.zeros(5)
    v = np.arange(5.0)
    assert cosine(z, v) == 0.0
    assert pearson(z, v) == 0.0  # zero-centred zero vector
    assert euclidean(z, v) == 0.0  # no overlap -> zero denom
    cm = np.asarray(cosine_matrix(np.stack([z, v])))
    assert cm[0, 1] == 0.0 and cm[1, 1] == pytest.approx(1.0, abs=1e-6)


def test_sparse_dict_forms():
    x1 = {1: 2.0, 2: 1.0, 5: 3.0}
    x2 = {1: 1.0, 5: 2.0, 9: 4.0}
    # overlap keys {1, 5}: manual cosine over [2,3] vs [1,2]
    a, b = np.array([2.0, 3.0]), np.array([1.0, 2.0])
    want = a.dot(b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cosine_sp(x1, x2) == pytest.approx(want)
    assert cosine_sp(x1, {7: 1.0}) == 0.0

    # pearson_sp centres by the FULL dict means (reference semantics)
    m1, m2 = 2.0, 7.0 / 3.0
    ac, bc = a - m1, b - m2
    want_p = ac.dot(bc) / (np.linalg.norm(ac) * np.linalg.norm(bc))
    assert pearson_sp(x1, x2) == pytest.approx(want_p)
    # zero denominator WITH overlap -> 1 (util/algorithm.py:78-81)
    assert pearson_sp({1: 1.0, 2: 1.0}, {1: 5.0, 9: 1.0}) == pytest.approx(1.0)

    # euclidean_sp keeps the reference's formula: 1 / sum(x1^2 - x2^2)
    assert euclidean_sp(x1, x2) == pytest.approx(1.0 / ((4 - 1) + (9 - 4)))
    assert euclidean_sp({1: 1.0}, {1: 1.0}) == 0.0  # zero total

    assert similarity(x1, x2, "pcc") == pytest.approx(pearson_sp(x1, x2))
    assert similarity(x1, x2, "euclidean") == pytest.approx(euclidean_sp(x1, x2))
    assert similarity(x1, x2, "cosine") == pytest.approx(cosine_sp(x1, x2))
