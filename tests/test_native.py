"""Native (C++ ctypes) data-plane tests."""

import numpy as np
import pandas as pd
import pytest

from hypergraph_diffusion_for_recommendation_tpu import native


@pytest.mark.skipif(not native.available(), reason="native lib failed to build")
def test_native_load_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    pairs = rng.integers(0, 10000, (5000, 2))
    # tab-separated with extra columns + header
    p = tmp_path / "train.txt"
    with open(p, "w") as f:
        f.write("user\titem\trating\n")
        for u, i in pairs:
            f.write(f"{u}\t{i}\t1.0\n")
    got = native.load_interactions(str(p))
    np.testing.assert_array_equal(got, pairs)
    # comma-separated
    p2 = tmp_path / "train.csv"
    with open(p2, "w") as f:
        f.write("user,item\n")
        for u, i in pairs[:100]:
            f.write(f"{u},{i}\n")
    got2 = native.load_interactions(str(p2))
    np.testing.assert_array_equal(got2, pairs[:100])


@pytest.mark.skipif(not native.available(), reason="native lib failed to build")
def test_native_factorize_matches_pandas():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 500, 20000).astype(np.int64)
    codes, uniques = native.factorize(vals)
    p_codes, p_uniques = pd.factorize(vals)
    np.testing.assert_array_equal(codes, p_codes.astype(np.int32))
    np.testing.assert_array_equal(uniques, np.asarray(p_uniques))


@pytest.mark.skipif(not native.available(), reason="native lib failed to build")
def test_native_faster_than_pandas(tmp_path):
    import time

    rng = np.random.default_rng(2)
    n = 2_000_000
    vals = rng.integers(0, 100_000, n).astype(np.int64)
    t0 = time.time()
    native.factorize(vals)
    t_native = time.time() - t0
    t0 = time.time()
    pd.factorize(vals)
    t_pandas = time.time() - t0
    # informational bound only — CI machines share cores with concurrent
    # device runs, so keep a generous margin (typically native wins)
    assert t_native < max(t_pandas * 5.0, 1.0), (t_native, t_pandas)


def test_sort_pairs_matches_lexsort():
    from hypergraph_diffusion_for_recommendation_tpu import native

    rng = np.random.default_rng(3)
    n = 1 << 17  # above the native threshold
    major = rng.integers(0, 5000, n)
    minor = rng.integers(0, 7000, n)
    got = native.sort_pairs(major, minor)
    want = np.lexsort((minor, major))
    # radix and lexsort are both stable -> identical permutations
    np.testing.assert_array_equal(got, want)

    # keys wider than one 16-bit radix digit (multi-pass path)
    major = rng.integers(0, 1 << 22, n)
    minor = rng.integers(0, 1 << 20, n)
    np.testing.assert_array_equal(
        native.sort_pairs(major, minor), np.lexsort((minor, major))
    )


def test_native_pack_blocked_matches_numpy():
    from hypergraph_diffusion_for_recommendation_tpu import native
    from hypergraph_diffusion_for_recommendation_tpu.ops.pallas.segment_spmm import (
        pack_blocked,
    )

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(4)
    n_rows, n_cols, nnz = 3000, 2000, 1 << 18
    rows = np.sort(rng.integers(0, n_rows, nnz))
    cols = rng.integers(0, n_cols, nnz)
    vals = rng.standard_normal(nnz).astype(np.float32)
    # the large-nnz call takes the native path; a small copy forced
    # through numpy (below threshold) is the reference
    blk_native = pack_blocked(rows, cols, vals, (n_rows, n_cols))
    got = native.pack_blocked_arrays(rows, cols, vals, n_rows, blk_native.eb, blk_native.rb)
    assert got is not None

    # numpy reference on the same inputs: shrink threshold via direct call
    small = pack_blocked(
        rows[: 1 << 12], cols[: 1 << 12], vals[: 1 << 12], (n_rows, n_cols)
    )  # sanity: numpy path still works on small inputs
    assert small.n_blocks > 0

    # numpy path reference for the full arrays: rebuild by slicing the
    # module internals (force the vectorised branch via padded live check)
    pad_rows = np.concatenate([rows, np.full(8, n_rows)])
    pad_cols = np.concatenate([cols, np.zeros(8, np.int64)])
    pad_vals = np.concatenate([vals, np.zeros(8, np.float32)])
    # live edges are a prefix -> native path; compare against numpy by
    # masking the native branch with a non-prefix pad layout
    nonprefix_rows = np.concatenate([pad_rows[-8:], rows])  # pads FIRST
    nonprefix_cols = np.concatenate([pad_cols[-8:], cols])
    nonprefix_vals = np.concatenate([pad_vals[-8:], vals])
    blk_numpy = pack_blocked(
        nonprefix_rows, nonprefix_cols, nonprefix_vals, (n_rows, n_cols)
    )
    np.testing.assert_array_equal(np.asarray(blk_native.cols), np.asarray(blk_numpy.cols))
    np.testing.assert_array_equal(
        np.asarray(blk_native.local_rows), np.asarray(blk_numpy.local_rows)
    )
    np.testing.assert_array_equal(np.asarray(blk_native.wmap), np.asarray(blk_numpy.wmap))
    np.testing.assert_allclose(np.asarray(blk_native.vals), np.asarray(blk_numpy.vals))
    # src differs only through the pad offset (numpy saw 8 pads first)
    live = np.asarray(blk_native.local_rows) < blk_native.rb
    np.testing.assert_array_equal(
        np.asarray(blk_native.src)[live] + 8, np.asarray(blk_numpy.src)[live]
    )
