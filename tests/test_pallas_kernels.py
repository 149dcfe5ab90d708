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


def _attach_blocked_pair(pair):
    """Manually attach blocked layouts to an AdjPair (tests run on CPU
    where _maybe_attach_blocked skips packing)."""
    from hypergraph_diffusion_for_recommendation_tpu.ops.pallas.segment_spmm import (
        pack_blocked,
    )

    f, b, tp = pair.fwd, pair.bwd, np.asarray(pair.t_perm)
    fb = pack_blocked(np.asarray(f.rows), np.asarray(f.cols), np.asarray(f.vals), f.shape)
    bb = pack_blocked(
        np.asarray(b.rows), np.asarray(b.cols), np.asarray(b.vals), b.shape, canon_map=tp
    )
    return pair.replace(fwd=f.replace(blocked=fb), bwd=b.replace(blocked=bb))


def test_with_new_vals_syncs_packed_layout(rng):
    import jax
    from hypergraph_diffusion_for_recommendation_tpu.core.types import with_new_vals
    from hypergraph_diffusion_for_recommendation_tpu.data.device import make_adj_pair

    mat = _random_csr(rng, 500, 300, 0.05).tocoo()
    pair = _attach_blocked_pair(
        make_adj_pair(mat.row, mat.col, mat.data, (500, 300))
    )
    new_vals = jnp.asarray(rng.standard_normal(pair.fwd.vals.shape[0]).astype(np.float32))
    sp = with_new_vals(pair.fwd, new_vals)
    x = jnp.asarray(rng.standard_normal((300, 32)).astype(np.float32))
    got = blocked_spmm(sp.blocked, x, None, interpret=True)
    ref = jax.ops.segment_sum(
        x[sp.cols] * new_vals[:, None], sp.rows, num_segments=500
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_hash_dropout_consistent_across_layouts(rng):
    """AdjPair.dropped must apply the SAME per-edge mask to fwd vals,
    transposed vals, and both packed layouts (no runtime gathers)."""
    import jax
    from hypergraph_diffusion_for_recommendation_tpu.data.device import make_adj_pair

    mat = _random_csr(rng, 400, 400, 0.05).tocoo()
    pair = _attach_blocked_pair(make_adj_pair(mat.row, mat.col, mat.data, (400, 400)))
    key = jax.random.PRNGKey(7)
    d = pair.dropped(key, 0.7)

    fv = np.asarray(d.fwd.vals)
    # transpose consistency: bwd.vals == fwd.vals[t_perm]
    np.testing.assert_allclose(np.asarray(d.bwd.vals), fv[np.asarray(pair.t_perm)])
    # packed consistency: blocked.vals == fwd.vals[src] on live slots
    for side in (d.fwd, d.bwd):
        b = side.blocked
        live = np.asarray(b.local_rows).reshape(-1) < b.rb
        packed = np.asarray(b.vals).reshape(-1)
        expect = np.asarray(side.vals)[np.asarray(b.src).reshape(-1)]
        np.testing.assert_allclose(packed[live], expect[live])
    # keep fraction near keep_rate, survivors rescaled by 1/keep
    live_f = np.asarray(pair.fwd.vals) != 0
    kept = fv[live_f] != 0
    assert abs(kept.mean() - 0.7) < 0.06
    np.testing.assert_allclose(
        fv[live_f][kept], np.asarray(pair.fwd.vals)[live_f][kept] / 0.7, rtol=1e-6
    )
    # different keys -> different masks; same key -> identical
    d2 = pair.dropped(jax.random.PRNGKey(8), 0.7)
    assert not np.array_equal(np.asarray(d2.fwd.vals), fv)
    d3 = pair.dropped(key, 0.7)
    np.testing.assert_array_equal(np.asarray(d3.fwd.vals), fv)


def test_pack_blocked_matches_naive():
    """The vectorised packer must reproduce the naive per-window layout
    exactly (cols/vals/local_rows/src/wmap), including empty windows,
    pad edges, and canon_map composition."""
    import numpy as np

    from hypergraph_diffusion_for_recommendation_tpu.ops.pallas.segment_spmm import (
        pack_blocked,
    )

    rng = np.random.default_rng(3)
    n, eb, rb = 700, 32, 64  # rows 640-699 empty-ish; window 2 left empty below
    nnz = 900
    rows = np.sort(rng.integers(0, n, nnz))
    rows = rows[(rows < 128) | (rows >= 192)]  # empty window [128,192)
    cols = rng.integers(0, n, rows.shape[0])
    vals = rng.standard_normal(rows.shape[0]).astype(np.float32)
    # append pad entries (row == n) that must be dropped
    rows = np.concatenate([rows, np.full(7, n)])
    cols = np.concatenate([cols, np.zeros(7, np.int64)])
    vals = np.concatenate([vals, np.zeros(7, np.float32)])
    canon = rng.permutation(rows.shape[0]).astype(np.int64)

    blk = pack_blocked(rows, cols, vals, (n, n), edge_block=eb, row_block=rb,
                       canon_map=canon)

    # naive reference layout
    live = np.nonzero(rows < n)[0]
    rl, cl, vl = rows[live], cols[live], vals[live]
    n_windows = -(-n // rb)
    starts = np.searchsorted(rl, np.arange(n_windows) * rb)
    ends = np.append(starts[1:], rl.shape[0])
    exp_cols, exp_vals, exp_lrows, exp_src, exp_wmap = [], [], [], [], []
    for w in range(n_windows):
        lo, hi = int(starts[w]), int(ends[w])
        for b in range(max(-(-(hi - lo) // eb), 1)):
            s, e = lo + b * eb, min(lo + (b + 1) * eb, hi)
            m = max(e - s, 0)
            pad = eb - m
            exp_cols.append(np.concatenate([cl[s:e], np.zeros(pad, np.int64)]))
            exp_vals.append(np.concatenate([vl[s:e], np.zeros(pad, np.float32)]))
            exp_lrows.append(np.concatenate([rl[s:e] - w * rb, np.full(pad, rb)]))
            exp_src.append(np.concatenate([live[s:e], np.zeros(pad, np.int64)]))
            exp_wmap.append(w)

    # the packers pad the block count to a sublane multiple of 8 with
    # inert all-pad blocks (wmap repeats the last window)
    while len(exp_wmap) % 8:
        exp_cols.append(np.zeros(eb, np.int64))
        exp_vals.append(np.zeros(eb, np.float32))
        exp_lrows.append(np.full(eb, rb))
        exp_src.append(np.zeros(eb, np.int64))
        exp_wmap.append(exp_wmap[-1])

    assert blk.n_blocks == len(exp_wmap) and blk.n_windows == n_windows
    np.testing.assert_array_equal(np.asarray(blk.wmap), np.asarray(exp_wmap))
    np.testing.assert_array_equal(np.asarray(blk.cols), np.stack(exp_cols))
    np.testing.assert_array_equal(np.asarray(blk.vals), np.stack(exp_vals))
    np.testing.assert_array_equal(np.asarray(blk.local_rows), np.stack(exp_lrows))
    np.testing.assert_array_equal(np.asarray(blk.src), np.stack(exp_src))
    np.testing.assert_array_equal(np.asarray(blk.canon), canon[np.stack(exp_src)])


def test_pack_blocked_dedup_matches_scipy(rng):
    """Dedup-gather layout: forward, vals-override, and VJP all exact."""
    import jax
    from hypergraph_diffusion_for_recommendation_tpu.ops.pallas.segment_spmm import (
        pack_blocked_dedup,
    )

    n, m = 500, 700
    # include a hot column so blocks actually deduplicate
    rows = np.concatenate([rng.integers(0, n, 4000), rng.integers(0, n, 2000)])
    cols = np.concatenate([rng.integers(0, m, 4000), np.full(2000, 3)])
    vals = rng.standard_normal(rows.shape[0]).astype(np.float32)
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    x = rng.standard_normal((m, 64)).astype(np.float32)
    want = sps.coo_matrix((vals, (rows, cols)), shape=(n, m)) @ x

    for eb, rb, ub in [(128, 64, 32), (64, 32, 64), (256, 128, 8)]:
        blocked = pack_blocked_dedup(
            rows, cols, vals, (n, m), edge_block=eb, row_block=rb, unique_block=ub
        )
        got = np.asarray(blocked_spmm(blocked, jnp.asarray(x), interpret=True))
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    # vals-override + VJP on one config
    blocked = pack_blocked_dedup(
        rows, cols, vals, (n, m), edge_block=128, row_block=64, unique_block=32
    )
    new_vals = rng.standard_normal(vals.shape[0]).astype(np.float32)
    got = np.asarray(
        blocked_spmm(blocked, jnp.asarray(x), jnp.asarray(new_vals), interpret=True)
    )
    want2 = sps.coo_matrix((new_vals, (rows, cols)), shape=(n, m)) @ x
    np.testing.assert_allclose(got, want2, rtol=3e-4, atol=3e-4)

    f = lambda xx, vv: blocked_spmm(blocked, xx, vv, interpret=True).sum()
    gx, gv = jax.grad(f, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(new_vals))
    ones_ct = np.ones((n, 64), np.float32)
    ref_gx = sps.coo_matrix((new_vals, (rows, cols)), shape=(n, m)).T @ ones_ct
    ref_gv = (ones_ct[rows] * x[cols]).sum(1)
    np.testing.assert_allclose(np.asarray(gx), ref_gx, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(gv), ref_gv, rtol=3e-4, atol=3e-4)


def test_int8_spmm_close_to_exact(rng):
    """int8 quantised-operand mode: ~1% relative error vs exact."""
    import dataclasses

    mat = _random_csr(rng, 600, 800, 0.02)
    coo = mat.tocoo()
    order = np.lexsort((coo.col, coo.row))
    blocked = pack_blocked(coo.row[order], coo.col[order], coo.data[order], mat.shape)
    blocked8 = dataclasses.replace(blocked, int8=True)
    x = rng.standard_normal((800, 64)).astype(np.float32)
    want = mat @ x
    got = np.asarray(blocked_spmm(blocked8, jnp.asarray(x), interpret=True))
    denom = np.abs(want).max()
    assert np.abs(got - want).max() / denom < 0.02, np.abs(got - want).max() / denom


def test_dedup_int8_spmm_close_to_exact(rng):
    """Combined dedup + int8 layout (VERDICT r2 #3): distinct-col gather
    of quantised rows — same ~1% error budget as plain int8."""
    import dataclasses

    import jax
    from hypergraph_diffusion_for_recommendation_tpu.ops.pallas.segment_spmm import (
        pack_blocked_dedup,
    )

    mat = _random_csr(rng, 600, 800, 0.02)
    # a hot column so blocks actually deduplicate
    mat[:, 13] = 1.0
    mat = mat.tocsr()
    coo = mat.tocoo()
    order = np.lexsort((coo.col, coo.row))
    blocked = pack_blocked_dedup(
        coo.row[order], coo.col[order], coo.data[order], mat.shape
    )
    assert blocked.ucols is not None
    blocked8 = dataclasses.replace(blocked, int8=True)
    x = rng.standard_normal((800, 64)).astype(np.float32)
    want = mat @ x
    got = np.asarray(blocked_spmm(blocked8, jnp.asarray(x), interpret=True))
    denom = np.abs(want).max()
    assert np.abs(got - want).max() / denom < 0.02, np.abs(got - want).max() / denom
    # grads still flow through the exact XLA backward
    gx = jax.grad(lambda xx: jnp.sum(blocked_spmm(blocked8, xx, interpret=True)))(
        jnp.asarray(x)
    )
    ref_gx = np.asarray(mat.T @ np.ones((600, 64), np.float32))
    np.testing.assert_allclose(np.asarray(gx), ref_gx, rtol=3e-4, atol=3e-4)


def test_dedup_auto_selection(rng):
    """Layout auto-selector (BENCH_NOTES round 3): dense-column graphs
    pick the dedup layout; sparse-column graphs keep the base layout."""
    from hypergraph_diffusion_for_recommendation_tpu.data.device import dedup_auto

    # ML-1M-like: 64 cols hammered by 4096 edges -> multiplicity >> 4
    rows = np.sort(rng.integers(0, 1024, 4096))
    cols = rng.integers(0, 64, 4096)
    assert dedup_auto(rows, cols, (1024, 64), row_block=256)
    # LastFM-like: near-unique cols -> multiplicity ~1
    cols_sparse = rng.permutation(100_000)[:4096]
    assert not dedup_auto(rows, cols_sparse, (1024, 100_000), row_block=256)
    # pad rows (== shape[0]) are ignored; all-pad -> False
    assert not dedup_auto(np.full(8, 1024), np.zeros(8, int), (1024, 64), 256)
