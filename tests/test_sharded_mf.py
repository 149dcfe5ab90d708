"""Explicit shard_map embedding engine: equivalence vs a dense single-
device implementation of the identical SGD step."""

import numpy as np
import jax
import jax.numpy as jnp

from hypergraph_diffusion_for_recommendation_tpu.parallel import ShardedMF, make_mesh
from hypergraph_diffusion_for_recommendation_tpu.ops.losses import bpr_loss


def test_sharded_mf_matches_dense_step():
    mesh = make_mesh(4, 2)
    n_users, n_items, dim, B = 96, 128, 16, 32
    mf = ShardedMF(mesh, n_users, n_items, dim, lrate=0.1, seed=3)
    u0 = np.asarray(mf.user_table).copy()
    i0 = np.asarray(mf.item_table).copy()

    rng = np.random.default_rng(0)
    users = jnp.asarray(rng.integers(0, n_users, B), jnp.int32)
    pos = jnp.asarray(rng.integers(0, n_items, B), jnp.int32)
    neg = jnp.asarray(rng.integers(0, n_items, B), jnp.int32)

    loss = mf.train_step(users, pos, neg)

    # dense reference: identical batch, identical math, one device.
    # the sharded step psums per-data-shard grads / n_data, where each
    # shard's loss is the mean over B/n_data rows: the combined update
    # equals the full-batch mean gradient.
    def dense_loss(u_tbl, i_tbl):
        return bpr_loss(u_tbl[users], i_tbl[pos], i_tbl[neg])

    du, di = jax.grad(dense_loss, argnums=(0, 1))(jnp.asarray(u0), jnp.asarray(i0))
    want_u = u0 - 0.1 * np.asarray(du)
    want_i = i0 - 0.1 * np.asarray(di)
    np.testing.assert_allclose(np.asarray(mf.user_table), want_u, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mf.item_table), want_i, rtol=1e-4, atol=1e-6)
    want_loss = float(dense_loss(jnp.asarray(u0), jnp.asarray(i0)))
    assert abs(loss - want_loss) < 1e-5


def test_sharded_mf_learns():
    mesh = make_mesh(4, 2)
    rng = np.random.default_rng(1)
    n_users, n_items, dim = 64, 96, 16
    # planted preferences: user u likes items with same parity bucket
    users, items = [], []
    for u in range(n_users):
        likes = [i for i in range(n_items) if i % 8 == u % 8]
        for i in likes:
            users.append(u); items.append(i)
    users = np.asarray(users); items = np.asarray(items)
    mf = ShardedMF(mesh, n_users, n_items, dim, lrate=2.0, seed=0)
    losses = []
    for ep in range(400):
        perm = rng.permutation(len(users))[:64]
        neg = rng.integers(0, n_items, 64)
        losses.append(mf.train_step(
            jnp.asarray(users[perm], jnp.int32),
            jnp.asarray(items[perm], jnp.int32),
            jnp.asarray(neg, jnp.int32),
        ))
    assert np.mean(losses[-10:]) < losses[0] * 0.7, (losses[0], np.mean(losses[-10:]))
