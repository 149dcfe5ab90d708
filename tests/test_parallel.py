"""Multi-device (8 virtual CPU) sharding tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hypergraph_diffusion_for_recommendation_tpu.parallel import (
    MODEL_AXIS,
    make_mesh,
    param_shardings,
    replicated,
    row_sharded,
    sharded_lookup,
    sharded_user_topk,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh(4, 2)


def test_sharded_lookup_matches_gather(mesh):
    from jax.sharding import PartitionSpec as P

    table = jnp.asarray(np.random.default_rng(0).standard_normal((64, 8)), jnp.float32)
    idx = jnp.asarray([0, 5, 63, 17, 32, 31], jnp.int32)

    fn = jax.shard_map(
        lambda t, i: sharded_lookup(t, i, MODEL_AXIS),
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P()),
        out_specs=P(),
    )
    got = fn(jax.device_put(table, row_sharded(mesh)), jax.device_put(idx, replicated(mesh)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(table[idx]), rtol=1e-6)


def test_sharded_topk_matches_local(mesh):
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    items = jnp.asarray(rng.standard_normal((100, 8)), jnp.float32)  # not shard-divisible
    rated = jnp.full((16, 4), -1, jnp.int32)
    rated = rated.at[0, 0].set(3)

    vals, ids = sharded_user_topk(mesh, u, jax.device_put(items, row_sharded(mesh)), rated, k=7)
    from hypergraph_diffusion_for_recommendation_tpu.ops.topk import masked_topk

    ref_vals, ref_ids = masked_topk(jnp.dot(u, items.T, precision="highest"), rated, 7)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-5)


def test_dryrun_multichip_8():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    vals, ids = jax.jit(fn)(*args)
    assert ids.shape[1] == 20
