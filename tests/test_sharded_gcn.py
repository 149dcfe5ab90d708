"""Explicit shard_map graph engine: exact equivalence vs the
single-device LightGCN step (propagation + BPR + SGD) on the virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from hypergraph_diffusion_for_recommendation_tpu.data import build_interaction
from hypergraph_diffusion_for_recommendation_tpu.ops.losses import bpr_loss
from hypergraph_diffusion_for_recommendation_tpu.parallel import ShardedLightGCN, make_mesh


def _dense_reference(norm_adj, table, n_layers, n_users, users, pos, neg, lrate):
    """Single-device reference using the SAME segment-sum op order."""
    coo = norm_adj.tocoo()
    order = np.lexsort((coo.col, coo.row))
    rows = jnp.asarray(coo.row[order].astype(np.int32))
    cols = jnp.asarray(coo.col[order].astype(np.int32))
    vals = jnp.asarray(coo.data[order].astype(np.float32))
    n = norm_adj.shape[0]

    def loss_fn(tbl):
        acc = tbl
        x = tbl
        for _ in range(n_layers):
            x = jax.ops.segment_sum(x[cols] * vals[:, None], rows, num_segments=tbl.shape[0])
            acc = acc + x
        out = acc / (n_layers + 1)
        return bpr_loss(out[users], out[n_users + pos], out[n_users + neg])

    loss, grad = jax.value_and_grad(loss_fn)(table)
    return table - lrate * grad, float(loss)


def test_sharded_lightgcn_matches_dense(tiny_dataset):
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    mesh = make_mesh(2, 4)
    model = ShardedLightGCN(
        mesh, inter.norm_adj, inter.n_users, inter.n_items, dim=16,
        n_layers=2, lrate=0.1, seed=3,
    )
    t0 = np.asarray(model.table).copy()

    rng = np.random.default_rng(0)
    B = 64
    users = jnp.asarray(rng.integers(0, inter.n_users, B), jnp.int32)
    pos = jnp.asarray(rng.integers(0, inter.n_items, B), jnp.int32)
    neg = jnp.asarray(rng.integers(0, inter.n_items, B), jnp.int32)

    loss = model.train_step(users, pos, neg)
    want_table, want_loss = _dense_reference(
        inter.norm_adj, jnp.asarray(t0), 2, inter.n_users, users, pos, neg, 0.1
    )
    assert abs(loss - want_loss) < 1e-5
    # f32 reassociation across shard boundaries (split segment sums,
    # per-data-shard grad means); a real indexing/collective bug shows
    # up as O(0.1) errors, far above this tolerance
    np.testing.assert_allclose(
        np.asarray(model.table), np.asarray(want_table), rtol=2e-3, atol=3e-4
    )


def test_sharded_lightgcn_learns(tiny_dataset):
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    mesh = make_mesh(2, 4)
    model = ShardedLightGCN(
        mesh, inter.norm_adj, inter.n_users, inter.n_items, dim=16,
        n_layers=2, lrate=3.0, seed=1,
    )
    rng = np.random.default_rng(2)
    eu = inter.train_u
    ei = inter.train_i
    losses = []
    for step in range(120):
        idx = rng.integers(0, len(eu), 256)
        neg = rng.integers(0, inter.n_items, 256)
        losses.append(
            model.train_step(
                jnp.asarray(eu[idx], jnp.int32),
                jnp.asarray(ei[idx], jnp.int32),
                jnp.asarray(neg, jnp.int32),
            )
        )
    assert losses[-1] < losses[0] - 0.02, (losses[0], losses[-1])
    u, i = model.embeddings()
    assert u.shape == (inter.n_users, 16) and i.shape == (inter.n_items, 16)
