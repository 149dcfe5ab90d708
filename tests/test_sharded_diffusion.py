"""Row-window-sharded graph diffusion (parallel/sharded_adj.py) on the
8-virtual-device CPU mesh: kernel equivalence, gradient flow, dropout
mask agreement, and end-to-end production-trainer parity (the VERDICT
round-1 item: the flagship trains with the ADJACENCY sharded, numerics
matching the single-device path)."""

import numpy as np
import pytest
import scipy.sparse as sps

import jax
import jax.numpy as jnp

from hypergraph_diffusion_for_recommendation_tpu.core import make_config
from hypergraph_diffusion_for_recommendation_tpu.data import (
    build_cf_device_data,
    build_interaction,
    build_kg_device_data,
    build_knowledge,
)
from hypergraph_diffusion_for_recommendation_tpu.models import (
    build_model,
    model_data_needs,
    model_shard_needs,
)
from hypergraph_diffusion_for_recommendation_tpu.parallel import (
    ShardedCOO,
    make_mesh,
    shard_adj_pair_from_scipy,
    sharded_spmm,
)
from hypergraph_diffusion_for_recommendation_tpu.train import Trainer


def _rand_sparse(n, m, nnz, seed=0):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, m, nnz)
    vals = rng.normal(size=nnz).astype(np.float32)
    return sps.coo_matrix((vals, (rows, cols)), shape=(n, m)).tocsr()


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(data=2, model=4)


def test_sharded_spmm_matches_scipy(mesh):
    mat = _rand_sparse(203, 117, 1500, seed=1)
    pair = shard_adj_pair_from_scipy(mat, mesh)
    assert isinstance(pair.fwd, ShardedCOO)
    x = np.random.default_rng(2).normal(size=(117, 16)).astype(np.float32)
    got = np.asarray(sharded_spmm(pair.fwd, jnp.asarray(x)))
    want = mat @ x
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # transpose direction
    y = np.random.default_rng(3).normal(size=(203, 16)).astype(np.float32)
    got_t = np.asarray(sharded_spmm(pair.bwd, jnp.asarray(y)))
    np.testing.assert_allclose(got_t, mat.T @ y, rtol=2e-5, atol=2e-5)


def test_sharded_spmm_blocked_kernel_matches(mesh):
    """Per-shard pallas layout (interpret mode on CPU) == scipy."""
    from hypergraph_diffusion_for_recommendation_tpu.parallel.sharded_adj import (
        shard_sparse,
    )

    mat = _rand_sparse(180, 90, 1200, seed=4).tocoo()
    sp = shard_sparse(mat.row, mat.col, mat.data, mat.shape, mesh,
                      attach_blocked=True)
    assert sp.blocked is not None
    x = np.random.default_rng(5).normal(size=(90, 8)).astype(np.float32)
    got = np.asarray(sharded_spmm(sp, jnp.asarray(x)))
    np.testing.assert_allclose(got, mat.tocsr() @ x, rtol=2e-5, atol=2e-5)


def _skewed_sparse(n, m, nnz, seed=0):
    """Zipf-skewed rows: most edges land in the first row window, the
    regime where window sharding degenerates and balanced mode pays."""
    rng = np.random.default_rng(seed)
    rows = np.minimum((rng.zipf(1.3, nnz) - 1), n - 1)
    cols = rng.integers(0, m, nnz)
    vals = rng.normal(size=nnz).astype(np.float32)
    return sps.coo_matrix((vals, (rows, cols)), shape=(n, m)).tocsr()


def test_balanced_mode_matches_scipy_and_auto_picks_it(mesh):
    """Edge-balanced sharding: equal nnz per shard on a skewed graph,
    full-row partials reduced by psum_scatter; numerics == scipy and
    mode='auto' detects the skew."""
    from hypergraph_diffusion_for_recommendation_tpu.parallel.sharded_adj import (
        shard_sparse,
    )

    mat = _skewed_sparse(203, 117, 4000, seed=11).tocoo()
    sp = shard_sparse(mat.row, mat.col, mat.data, mat.shape, mesh)
    assert sp.balanced, "auto should pick balanced on a zipf graph"
    # perfect balance: e_pad ~= nnz/S (padded to 8), not max-window nnz
    assert sp.lrows.shape[1] <= ((sp.nnz // sp.n_shards) // 8 + 2) * 8
    x = np.random.default_rng(12).normal(size=(117, 16)).astype(np.float32)
    got = np.asarray(sharded_spmm(sp, jnp.asarray(x)))
    np.testing.assert_allclose(got, mat.tocsr() @ x, rtol=2e-5, atol=2e-5)

    # uniform graphs keep window mode (no output collective)
    uni = _rand_sparse(203, 117, 4000, seed=13).tocoo()
    sp_u = shard_sparse(uni.row, uni.col, uni.data, uni.shape, mesh)
    assert not sp_u.balanced


def test_balanced_blocked_kernel_and_grad(mesh):
    """Balanced mode with the per-shard pallas layout (interpret on CPU)
    and through value_and_grad — two-hop chain vs dense reference."""
    from hypergraph_diffusion_for_recommendation_tpu.parallel.sharded_adj import (
        shard_adj_pair,
    )

    mat = _skewed_sparse(96, 64, 2000, seed=14).tocoo()
    # dedupe to CSR canonical (shard_adj_pair sums duplicates? no — keep
    # explicit distinct edges for an exact dense comparison)
    csr = sps.coo_matrix((mat.data, (mat.row, mat.col)), shape=mat.shape).tocsr()
    csr.sum_duplicates()
    coo = csr.tocoo()
    pair = shard_adj_pair(coo.row, coo.col, coo.data, coo.shape, mesh,
                          mode="balanced")
    assert pair.fwd.balanced and pair.bwd.balanced
    dense = jnp.asarray(csr.toarray())
    x = jnp.asarray(np.random.default_rng(15).normal(size=(64, 8)).astype(np.float32))

    def f_sharded(x):
        y = sharded_spmm(pair.fwd, x)
        z = sharded_spmm(pair.bwd, y)
        return jnp.sum(jnp.sin(z))

    def f_dense(x):
        z = dense.T @ (dense @ x)
        return jnp.sum(jnp.sin(z))

    np.testing.assert_allclose(float(f_sharded(x)), float(f_dense(x)),
                               rtol=1e-4)
    g_s = jax.grad(f_sharded)(x)
    g_d = jax.grad(f_dense)(x)
    # f32 accumulation-order noise is amplified by the zipf head row
    # that absorbs most of the 2k edges; forward already matched at 1e-4
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d), rtol=1e-3,
                               atol=1e-3)


def test_balanced_dropout_matches_unsharded(mesh):
    """Canonical-id dropout masks agree between the balanced layout and
    the replicated one."""
    from hypergraph_diffusion_for_recommendation_tpu.data.device import (
        adj_pair_from_scipy,
    )
    from hypergraph_diffusion_for_recommendation_tpu.ops.sparse import spmm

    mat = _skewed_sparse(120, 120, 3000, seed=16)
    mat.sum_duplicates()
    sharded = shard_adj_pair_from_scipy(mat, mesh, mode="balanced")
    plain = adj_pair_from_scipy(mat)
    x = jnp.asarray(np.random.default_rng(17).normal(size=(120, 8)).astype(np.float32))
    rng = jax.random.PRNGKey(7)
    got = np.asarray(spmm(sharded.dropped(rng, 0.6).fwd, x))
    want = np.asarray(spmm(plain.dropped(rng, 0.6).fwd, x))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_sharded_spmm_grad_matches(mesh):
    """d/dx of a two-hop chain through the sharded layout == the dense
    reference gradient (all_gather transposes to reduce-scatter)."""
    mat = _rand_sparse(96, 64, 800, seed=6)
    pair = shard_adj_pair_from_scipy(mat, mesh)
    dense = jnp.asarray(mat.toarray())
    x = jnp.asarray(np.random.default_rng(7).normal(size=(64, 8)).astype(np.float32))

    def f_sharded(x):
        y = sharded_spmm(pair.fwd, x)  # [96, 8]
        z = sharded_spmm(pair.bwd, y)  # [64, 8]
        return jnp.sum(jnp.sin(z))

    def f_dense(x):
        z = dense.T @ (dense @ x)
        return jnp.sum(jnp.sin(z))

    g_s = jax.grad(f_sharded)(x)
    g_d = jax.grad(f_dense)(x)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d), rtol=1e-4, atol=1e-4)


def test_sharded_dropout_matches_unsharded(mesh):
    """The counter-hash dropout draws the SAME mask on the sharded
    layout as on the replicated one (global canonical edge ids), so
    dropped-spmm outputs agree exactly."""
    from hypergraph_diffusion_for_recommendation_tpu.data.device import (
        adj_pair_from_scipy,
    )

    mat = _rand_sparse(120, 120, 900, seed=8)
    sharded = shard_adj_pair_from_scipy(mat, mesh)
    plain = adj_pair_from_scipy(mat)
    x = jnp.asarray(np.random.default_rng(9).normal(size=(120, 8)).astype(np.float32))
    rng = jax.random.PRNGKey(42)

    from hypergraph_diffusion_for_recommendation_tpu.ops.sparse import spmm

    got = np.asarray(spmm(sharded.dropped(rng, 0.7).fwd, x))
    want = np.asarray(spmm(plain.dropped(rng, 0.7).fwd, x))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # and the transposed direction sees the same mask
    got_b = np.asarray(spmm(sharded.dropped(rng, 0.7).bwd, spmm(sharded.fwd, x)))
    want_b = np.asarray(spmm(plain.dropped(rng, 0.7).bwd, spmm(plain.fwd, x)))
    np.testing.assert_allclose(got_b, want_b, rtol=2e-5, atol=2e-5)


def _train(name, mesh, shard, tiny, kg_tiny=None, epochs=3, **kw):
    if kg_tiny is not None:
        train, test, kg_df = kg_tiny
    else:
        train, test = tiny
    inter = build_interaction(train, test)
    shard_needs = model_shard_needs(name) if shard else frozenset()
    cf = build_cf_device_data(
        inter, needs=model_data_needs(name), mesh=mesh if shard else None,
        shard_needs=shard_needs,
    )
    kg_dev = None
    if kg_tiny is not None:
        kg = build_knowledge(kg_df, inter)
        kg_dev = build_kg_device_data(
            kg, mesh=mesh if shard else None, shard=shard and "kg" in shard_needs
        )
    cfg = make_config(name, max_epoch=epochs, early_stopping_steps=100,
                      eval_user_batch=64, shard_min_rows=16, **kw)
    bundle = build_model(cfg, cf, kg_dev, mesh=mesh)
    trainer = Trainer(bundle, mesh=mesh)
    losses = [trainer.run_epoch(ep)[0] for ep in range(epochs)]
    return losses, trainer.evaluate()


def test_lightgcn_sharded_adjacency_matches_replicated(mesh, tiny_dataset):
    """Production trainer end-to-end: LightGCN with the bipartite
    adjacency row-window sharded over the model axis trains identically
    (same losses, same metrics) to the replicated-adjacency run."""
    kw = dict(lrate=0.05, hyper_dim=16, n_layers=2, reg=0.01, batch_size=256)
    l_rep, m_rep = _train("LightGCN", mesh, False, tiny_dataset, **kw)
    l_sh, m_sh = _train("LightGCN", mesh, True, tiny_dataset, **kw)
    np.testing.assert_allclose(l_sh, l_rep, rtol=1e-4)
    for k in m_rep:
        for metric in m_rep[k]:
            np.testing.assert_allclose(m_sh[k][metric], m_rep[k][metric], rtol=1e-3,
                                       atol=1e-6)


@pytest.mark.slow
def test_hd3_sharded_adjacency_matches_replicated(mesh, tiny_dataset):
    """HGNN_HD3 (dual-view diffusion, edge dropout on) with adj+b_hyper
    sharded: same dropout masks (canonical ids), same losses."""
    kw = dict(lrate=0.01, hyper_dim=16, reg=0.1, drop_rate=0.2, batch_size=256,
              mode="local_only")
    l_rep, _ = _train("HGNN_HD3", mesh, False, tiny_dataset, epochs=2, **kw)
    l_sh, _ = _train("HGNN_HD3", mesh, True, tiny_dataset, epochs=2, **kw)
    np.testing.assert_allclose(l_sh, l_rep, rtol=1e-3)


@pytest.mark.slow
def test_khgrec_sharded_adjacency_matches_replicated(mesh, tiny_kg_dataset):
    """Flagship: CF adjacency AND the KG adjacency sharded; joint
    CF+KG+SSL losses match the replicated run."""
    kw = dict(lrate=0.01, hyper_dim=16, relation_dim=8, reg=0.1, drop_rate=0.2,
              batch_size=256, batch_size_kg=512, temp=1.0, cl_rate=0.01,
              mode="full")
    l_rep, m_rep = _train("KHGRec", mesh, False, None, tiny_kg_dataset, epochs=2, **kw)
    l_sh, m_sh = _train("KHGRec", mesh, True, None, tiny_kg_dataset, epochs=2, **kw)
    np.testing.assert_allclose(l_sh, l_rep, rtol=1e-3)
    for metric in m_rep[20]:
        np.testing.assert_allclose(m_sh[20][metric], m_rep[20][metric], rtol=1e-2,
                                   atol=1e-5)


def test_sharded_spmm_dedup_layout_matches(mesh, monkeypatch):
    """Forced dedup-gather per-shard layout (HGDR_DEDUP=1): stacked
    ucols/local_cols arrays, interpret-mode kernel == scipy, both modes."""
    from hypergraph_diffusion_for_recommendation_tpu.parallel.sharded_adj import (
        shard_sparse,
    )

    from hypergraph_diffusion_for_recommendation_tpu.data import device as devmod

    monkeypatch.setattr(devmod, "PALLAS_DEDUP", "1")
    mat = _rand_sparse(180, 60, 1600, seed=6).tocoo()  # dense cols dedup well
    for mode in ("window", "balanced"):
        sp = shard_sparse(mat.row, mat.col, mat.data, mat.shape, mesh,
                          attach_blocked=True, mode=mode)
        assert sp.blocked is not None and sp.blocked.ucols is not None
        x = np.random.default_rng(7).normal(size=(60, 8)).astype(np.float32)
        got = np.asarray(sharded_spmm(sp, jnp.asarray(x)))
        np.testing.assert_allclose(got, mat.tocsr() @ x, rtol=2e-5, atol=2e-5,
                                   err_msg=mode)
