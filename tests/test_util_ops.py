"""Coverage for the parity utility ops not exercised by the model zoo."""

import numpy as np
import scipy.sparse as sps
import jax
import jax.numpy as jnp

from hypergraph_diffusion_for_recommendation_tpu.core import (
    from_scipy,
    to_scipy,
    transpose_coo,
)
from hypergraph_diffusion_for_recommendation_tpu.ops.dropout import drop_edges_by_nodes
from hypergraph_diffusion_for_recommendation_tpu.ops.sparse import sp_dense_left, spmm


def _rand(rng, n, m, density=0.08):
    mat = sps.random(n, m, density=density, random_state=np.random.RandomState(3), format="csr")
    mat.data = rng.standard_normal(mat.nnz).astype(np.float32)
    return mat


def test_to_scipy_roundtrip(rng):
    mat = _rand(rng, 30, 40)
    back = to_scipy(from_scipy(mat)).tocsr()
    assert (back != mat).nnz == 0


def test_transpose_coo(rng):
    mat = _rand(rng, 30, 40)
    t = transpose_coo(from_scipy(mat))
    x = rng.standard_normal((30, 4)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(spmm(t, jnp.asarray(x))), mat.T @ x, rtol=1e-4, atol=1e-5)


def test_sp_dense_left(rng):
    mat = _rand(rng, 30, 40)
    x = rng.standard_normal((8, 30)).astype(np.float32)
    got = sp_dense_left(jnp.asarray(x), from_scipy(mat))
    np.testing.assert_allclose(np.asarray(got), x @ mat.toarray(), rtol=1e-4, atol=1e-5)


def test_drop_edges_by_nodes(rng):
    mat = _rand(rng, 50, 50, density=0.2)
    sp = from_scipy(mat)
    out = drop_edges_by_nodes(jax.random.PRNGKey(0), sp, 0.4)
    vals = np.asarray(out.vals)[: sp.nnz]
    orig = np.asarray(sp.vals)[: sp.nnz]
    kept = vals != 0
    # surviving edges keep their ORIGINAL value (no rescale — parity with
    # data/augmentor.py:11-25)
    np.testing.assert_allclose(vals[kept], orig[kept])
    assert 0.1 < kept.mean() < 0.8


def test_epoch_pointwise_batches(tiny_dataset):
    from hypergraph_diffusion_for_recommendation_tpu.data import (
        build_cf_device_data,
        build_interaction,
    )
    from hypergraph_diffusion_for_recommendation_tpu.ops.sampling import (
        epoch_pointwise_batches,
        is_rated,
    )

    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cf = build_cf_device_data(inter)
    users, items, labels = epoch_pointwise_batches(
        jax.random.PRNGKey(0), cf.edge_u, cf.edge_i, cf.rated_pad, inter.n_items, 128, n_negs=4
    )
    assert users.shape == items.shape == labels.shape
    lab = np.asarray(labels)
    assert set(np.unique(lab)) == {0.0, 1.0}
    # positives are rated; label-0 items are (almost) never rated
    u = np.asarray(users).reshape(-1)
    it = np.asarray(items).reshape(-1)
    l = lab.reshape(-1)
    rated = np.asarray(is_rated(cf.rated_pad, jnp.asarray(u), jnp.asarray(it)))
    assert rated[l == 1].all()
    assert rated[l == 0].mean() < 1e-3
