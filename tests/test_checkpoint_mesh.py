"""Checkpoint round-trip UNDER A MESH (VERDICT round-1 item 7): sharded
params (model-axis tables) save, restore onto the same mesh with
shardings intact, and training resumes identically to an uninterrupted
run."""

import numpy as np
import pytest

import jax

from hypergraph_diffusion_for_recommendation_tpu.core import make_config
from hypergraph_diffusion_for_recommendation_tpu.data import (
    build_cf_device_data,
    build_interaction,
)
from hypergraph_diffusion_for_recommendation_tpu.models import (
    build_model,
    model_data_needs,
)
from hypergraph_diffusion_for_recommendation_tpu.parallel import MODEL_AXIS, make_mesh
from hypergraph_diffusion_for_recommendation_tpu.train import Trainer
from hypergraph_diffusion_for_recommendation_tpu.utils.checkpoint import (
    CheckpointManager,
)


def _make_trainer(tiny_dataset, mesh, seed=0):
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cf = build_cf_device_data(inter, needs=model_data_needs("MF"))
    # 120 users / 300 items with shard_min_rows=4: both tables row-shard
    cfg = make_config(
        "MF", lrate=0.05, hyper_dim=16, reg=0.01, batch_size=256,
        max_epoch=4, shard_min_rows=4, eval_user_batch=64,
    )
    bundle = build_model(cfg, cf, None, mesh=mesh)
    return Trainer(bundle, seed=seed, mesh=mesh)


def _sharded_leaves(params, mesh):
    out = {}

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}")
        else:
            out[prefix] = tree.sharding
    walk(params)
    return out


def test_checkpoint_restores_shardings_and_resumes(tmp_path, tiny_dataset):
    mesh = make_mesh(data=2, model=4)

    # uninterrupted 4-epoch reference
    ref = _make_trainer(tiny_dataset, mesh)
    ref_losses = [ref.run_epoch(ep)[0] for ep in range(4)]

    # interrupted run: 2 epochs, checkpoint, fresh trainer, restore
    a = _make_trainer(tiny_dataset, mesh)
    # the user table must actually be sharded for this test to mean anything
    pre = _sharded_leaves(a.params, mesh)
    assert any(
        s.spec and s.spec[0] == MODEL_AXIS for s in pre.values()
    ), f"no row-sharded tables in {pre}"
    for ep in range(2):
        a.run_epoch(ep)
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    ckpt.save(1, a.params, a.opt_state, a.extras, a.rng)

    b = _make_trainer(tiny_dataset, mesh)
    start = b.restore(ckpt)
    assert start == 2

    # shardings intact after the orbax round trip
    post = _sharded_leaves(b.params, mesh)
    assert pre.keys() == post.keys()
    for k in pre:
        assert str(post[k].spec) == str(pre[k].spec), (k, pre[k], post[k])
        assert post[k].mesh.shape == pre[k].mesh.shape, (k, pre[k], post[k])

    # values match the interrupted trainer exactly
    for la, lb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    # resumed epochs reproduce the uninterrupted run
    resumed = [b.run_epoch(ep)[0] for ep in range(start, 4)]
    np.testing.assert_allclose(resumed, ref_losses[2:], rtol=1e-5)
    ckpt.close()


def test_background_save_overlaps_and_roundtrips(tmp_path):
    """Background checkpointing: save() returns before the write lands;
    a subsequent restore joins the in-flight save and round-trips."""
    import jax
    import jax.numpy as jnp

    from hypergraph_diffusion_for_recommendation_tpu.utils.checkpoint import (
        CheckpointManager,
    )

    params = {"w": jnp.arange(8.0), "b": jnp.ones((3, 5))}
    opt = {"m": jnp.zeros(8), "v": jnp.zeros(8)}
    extras = {"att": jnp.full(4, 2.0)}
    rng = jax.random.PRNGKey(3)

    mgr = CheckpointManager(str(tmp_path / "ck"), background=True)
    mgr.save(0, params, opt, extras, rng)
    # reads join the pending save
    assert mgr.latest_step() == 0
    got = mgr.restore(None, {"params": params, "opt_state": opt,
                             "extras": extras, "rng": rng})
    import numpy as np

    np.testing.assert_array_equal(np.asarray(got["params"]["w"]), np.arange(8.0))
    np.testing.assert_array_equal(np.asarray(got["extras"]["att"]), np.full(4, 2.0))
    # a second queued save supersedes correctly after join
    params2 = {"w": jnp.arange(8.0) * 3, "b": jnp.ones((3, 5))}
    mgr.save(1, params2, opt, extras, rng)
    mgr.close()
    mgr2 = CheckpointManager(str(tmp_path / "ck"))
    assert mgr2.latest_step() == 1
    got2 = mgr2.restore(None, {"params": params, "opt_state": opt,
                               "extras": extras, "rng": rng})
    np.testing.assert_array_equal(np.asarray(got2["params"]["w"]), np.arange(8.0) * 3)
    mgr2.close()
