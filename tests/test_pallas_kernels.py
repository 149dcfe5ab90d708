"""Pallas kernel tests (interpret mode on CPU; same code path as TPU)."""

import numpy as np
import scipy.sparse as sps
import jax.numpy as jnp

from hypergraph_diffusion_for_recommendation_tpu.ops.pallas import (
    blocked_spmm,
    pack_blocked,
)


def _random_csr(rng, n, m, density):
    mat = sps.random(n, m, density=density, random_state=np.random.RandomState(7), format="csr")
    mat.data = rng.standard_normal(mat.nnz).astype(np.float32)
    return mat


def test_blocked_spmm_matches_scipy(rng):
    mat = _random_csr(rng, 700, 900, 0.02)
    coo = mat.tocoo()
    order = np.lexsort((coo.col, coo.row))
    blocked = pack_blocked(coo.row[order], coo.col[order], coo.data[order], mat.shape)
    x = rng.standard_normal((900, 64)).astype(np.float32)
    got = blocked_spmm(blocked, jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(got), mat @ x, rtol=2e-4, atol=2e-5)


def test_blocked_spmm_empty_windows(rng):
    # rows concentrated in one window; other windows must come out zero
    rows = np.zeros(50, np.int64)
    cols = np.arange(50, dtype=np.int64)
    vals = np.ones(50, np.float32)
    blocked = pack_blocked(rows, cols, vals, (1000, 64))
    x = rng.standard_normal((64, 32)).astype(np.float32)
    got = np.asarray(blocked_spmm(blocked, jnp.asarray(x), interpret=True))
    want = np.zeros((1000, 32), np.float32)
    want[0] = x[:50].sum(0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_blocked_spmm_power_law(rng):
    # skewed degree distribution: one hub row with thousands of edges
    n, m = 600, 400
    hub_edges = 3000
    rows = np.concatenate([np.zeros(hub_edges, np.int64), rng.integers(1, n, 2000)])
    cols = np.concatenate([rng.integers(0, m, hub_edges), rng.integers(0, m, 2000)])
    vals = rng.standard_normal(rows.shape[0]).astype(np.float32)
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    blocked = pack_blocked(rows, cols, vals, (n, m))
    x = rng.standard_normal((m, 16)).astype(np.float32)
    got = np.asarray(blocked_spmm(blocked, jnp.asarray(x), interpret=True))
    want = sps.coo_matrix((vals, (rows, cols)), shape=(n, m)) @ x
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_blocked_spmm_tile_size_variants(rng):
    """Forward + VJP must be exact for any (edge_block, row_block) tiling."""
    import jax

    mat = _random_csr(rng, 700, 500, 0.05)
    coo = mat.tocoo()
    order = np.lexsort((coo.col, coo.row))
    rows, cols, vals = coo.row[order], coo.col[order], coo.data[order]
    x = jnp.asarray(rng.standard_normal((500, 32)).astype(np.float32))
    ref = jnp.asarray(mat @ np.asarray(x))

    def loss_ref(xx):
        gathered = xx[jnp.asarray(cols)] * jnp.asarray(vals)[:, None]
        import jax.numpy as _jnp

        y = jax.ops.segment_sum(gathered, jnp.asarray(rows), num_segments=700)
        return _jnp.sum(y**2)

    g_ref = jax.grad(loss_ref)(x)
    for eb, rb in [(512, 128), (2048, 512), (4096, 1024)]:
        blocked = pack_blocked(rows, cols, vals, mat.shape, edge_block=eb, row_block=rb)
        got = blocked_spmm(blocked, x, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)
        g = jax.grad(lambda xx: jnp.sum(blocked_spmm(blocked, xx, interpret=True) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=2e-4, atol=2e-4)
