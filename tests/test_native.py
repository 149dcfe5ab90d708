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
