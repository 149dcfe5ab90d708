"""Kernel unit tests: padded-COO ops vs scipy/numpy references."""

import numpy as np
import scipy.sparse as sps
import jax
import jax.numpy as jnp

from hypergraph_diffusion_for_recommendation_tpu.core import from_scipy
from hypergraph_diffusion_for_recommendation_tpu.data.device import make_adj_pair
from hypergraph_diffusion_for_recommendation_tpu.ops import (
    segment_softmax,
    spmm,
    spmm_t,
    two_hop,
)
from hypergraph_diffusion_for_recommendation_tpu.ops.dropout import drop_edges


def random_csr(rng, n, m, density=0.05):
    mat = sps.random(n, m, density=density, random_state=np.random.RandomState(0), format="csr")
    mat.data = rng.standard_normal(mat.nnz).astype(np.float32)
    return mat


def test_spmm_matches_scipy(rng):
    mat = random_csr(rng, 57, 83)
    x = rng.standard_normal((83, 16)).astype(np.float32)
    got = spmm(from_scipy(mat), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), mat @ x, rtol=1e-4, atol=1e-5)


def test_spmm_t_matches_scipy(rng):
    mat = random_csr(rng, 57, 83)
    x = rng.standard_normal((57, 8)).astype(np.float32)
    got = spmm_t(from_scipy(mat), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), mat.T @ x, rtol=1e-4, atol=1e-5)


def test_adj_pair_transpose_consistency(rng):
    mat = random_csr(rng, 40, 64)
    coo = mat.tocoo()
    pair = make_adj_pair(coo.row, coo.col, coo.data, mat.shape)
    x = rng.standard_normal((40, 4)).astype(np.float32)
    got = spmm(pair.bwd, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), mat.T @ x, rtol=1e-4, atol=1e-5)


def test_two_hop_matches_scipy(rng):
    mat = random_csr(rng, 40, 64)
    coo = mat.tocoo()
    pair = make_adj_pair(coo.row, coo.col, coo.data, mat.shape)
    # two_hop computes A @ (A.T @ x) with x in the row space of A: [40, d]
    x = rng.standard_normal((40, 8)).astype(np.float32)
    got = two_hop(pair.fwd, pair.bwd, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), mat @ (mat.T @ x), rtol=1e-4, atol=1e-5)


def test_dropout_propagates_to_transpose(rng):
    mat = random_csr(rng, 30, 50, density=0.1)
    coo = mat.tocoo()
    pair = make_adj_pair(coo.row, coo.col, coo.data, mat.shape)
    dropped = pair.dropped(jax.random.PRNGKey(0), 0.6)
    # bwd values must be exactly the fwd values routed through t_perm:
    # reconstruct dense fwd and bwd and compare transposes.
    def dense(sp):
        out = np.zeros(sp.shape, np.float32)
        rows = np.asarray(sp.rows)
        cols = np.asarray(sp.cols)
        vals = np.asarray(sp.vals)
        ok = rows < sp.nrows
        np.add.at(out, (rows[ok], cols[ok]), vals[ok])
        return out

    np.testing.assert_allclose(dense(dropped.fwd).T, dense(dropped.bwd), rtol=1e-6)
    # surviving values are rescaled by 1/keep
    fv = np.asarray(dropped.fwd.vals)[: dropped.fwd.nnz]
    ov = np.asarray(pair.fwd.vals)[: pair.fwd.nnz]
    kept = fv != 0
    np.testing.assert_allclose(fv[kept], ov[kept] / 0.6, rtol=1e-5)
    assert 0.3 < kept.mean() < 0.9


def test_segment_softmax(rng):
    ids = np.sort(rng.integers(0, 10, 100)).astype(np.int32)
    scores = rng.standard_normal(100).astype(np.float32)
    got = np.asarray(segment_softmax(jnp.asarray(scores), jnp.asarray(ids), 10))
    for s in range(10):
        m = ids == s
        if m.sum() == 0:
            continue
        e = np.exp(scores[m] - scores[m].max())
        np.testing.assert_allclose(got[m], e / e.sum(), rtol=1e-5)


def test_segment_softmax_masked(rng):
    ids = np.sort(rng.integers(0, 6, 40)).astype(np.int32)
    scores = rng.standard_normal(40).astype(np.float32)
    valid = rng.random(40) > 0.3
    got = np.asarray(
        segment_softmax(jnp.asarray(scores), jnp.asarray(ids), 6, jnp.asarray(valid))
    )
    assert np.all(got[~valid] == 0)
    for s in range(6):
        m = (ids == s) & valid
        if m.sum() == 0:
            continue
        e = np.exp(scores[m] - scores[m].max())
        np.testing.assert_allclose(got[m], e / e.sum(), rtol=1e-5)
