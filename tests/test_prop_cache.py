"""Cached-propagation training (core/config.py prop_cache_steps).

K>1 runs the true full-graph loss every K-th step and trains the steps
between on cached propagated tables with straight-through gradients.
Checks: (a) off (K=0) is byte-for-byte the reference-parity path — the
bundle carries no cache state; (b) a cached run TRAINS (finite,
learning); (c) the cached-step loss VALUE equals the full loss evaluated
on the cached tables (the straight-through trick is value-exact);
(d) the age counter threads through chunked epochs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypergraph_diffusion_for_recommendation_tpu.core import make_config
from hypergraph_diffusion_for_recommendation_tpu.data import (
    build_cf_device_data,
    build_interaction,
    build_kg_device_data,
    build_knowledge,
)
from hypergraph_diffusion_for_recommendation_tpu.models import build_model
from hypergraph_diffusion_for_recommendation_tpu.train import Trainer

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def kg_setup(tiny_kg_dataset):
    train, test, kg_df = tiny_kg_dataset
    inter = build_interaction(train, test)
    kg = build_knowledge(kg_df, inter)
    cf_dev = build_cf_device_data(inter, eval_user_multiple=64)
    kg_dev = build_kg_device_data(kg)
    return inter, cf_dev, kg_dev


def _cfg(**kw):
    base = dict(
        batch_size=512, batch_size_kg=1024, hyper_dim=32, relation_dim=32,
        item_ranking=(10, 20), eval_user_batch=64, max_epoch=12,
        early_stopping_steps=20, lrate=0.005, temp=1.0, cl_rate=0.01,
        drop_rate=0.2, mode="full",
    )
    base.update(kw)
    return make_config("KHGRec", **base)


def test_off_has_no_cache_state(kg_setup):
    _, cf_dev, kg_dev = kg_setup
    bundle = build_model(_cfg(prop_cache_steps=0), cf_dev, kg_dev)
    _, extras = bundle.init(jax.random.PRNGKey(0))
    assert "prop_age" not in extras  # reference-parity path untouched


def test_cached_run_trains(kg_setup):
    _, cf_dev, kg_dev = kg_setup
    bundle = build_model(_cfg(prop_cache_steps=4), cf_dev, kg_dev)
    result = Trainer(bundle).fit(quiet=True)
    losses = [r.losses["train_loss"] for r in result.history]
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    # planted-cluster synthetic: chance recall@20 ~ 20/300; a cached-
    # propagation run must still learn far past it
    assert result.best_metrics["recall"] > 0.12, result.best_metrics


def test_cached_step_value_exact(kg_setup):
    """On a cached step the loss VALUE must equal full-forward values
    swapped for the cached tables — i.e. the straight-through terms
    contribute exactly zero to the forward."""
    _, cf_dev, kg_dev = kg_setup
    bundle = build_model(_cfg(prop_cache_steps=3, drop_rate=0.0), cf_dev, kg_dev)
    params, extras = bundle.init(jax.random.PRNGKey(1))
    t = Trainer(bundle, seed=1)
    # one epoch populates the cached tables and advances the age
    t.run_epoch(0)
    extras = t.extras
    age = int(extras["prop_age"])
    assert age > 0
    # craft a batch and evaluate the bundle loss at a cached age
    if age % 3 == 0:  # ensure the NEXT call lands on a cached step
        extras = dict(extras, prop_age=jnp.asarray(age + 1, jnp.int32))
    users = jnp.arange(16, dtype=jnp.int32)
    pos = jnp.arange(16, dtype=jnp.int32) % cf_dev.n_items
    neg = (jnp.arange(16, dtype=jnp.int32) + 7) % cf_dev.n_items
    kgd = kg_dev
    h = kgd.att_h[:32]
    r = kgd.att_r[:32]
    pt = kgd.att_t[:32]
    nt = (kgd.att_t[:32] + 1) % kgd.n_entities
    batch = (users, pos, neg, h, r, pt, nt)
    loss, aux = bundle.batch_loss(t.params, extras, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    # cached step must not change the cached tables
    new = aux["_new_extras"]
    np.testing.assert_array_equal(np.asarray(new["prop_u"]), np.asarray(extras["prop_u"]))
    assert int(new["prop_age"]) == int(extras["prop_age"]) + 1
    # value-exactness: recompute the BPR piece directly from the cached
    # tables (the straight-through term must vanish in the value)
    ue = np.asarray(extras["prop_u"])[np.asarray(users)]
    pe = np.asarray(extras["prop_fused"])[np.asarray(pos)]
    ne = np.asarray(extras["prop_fused"])[np.asarray(neg)]
    from hypergraph_diffusion_for_recommendation_tpu.ops.losses import bpr_loss

    rec_direct = float(bpr_loss(jnp.asarray(ue), jnp.asarray(pe), jnp.asarray(ne)))
    assert np.isclose(float(aux["rec_loss"]), rec_direct, rtol=1e-5), (
        float(aux["rec_loss"]), rec_direct)


def test_age_threads_through_epochs(kg_setup):
    _, cf_dev, kg_dev = kg_setup
    bundle = build_model(_cfg(prop_cache_steps=4, max_epoch=2), cf_dev, kg_dev)
    t = Trainer(bundle, seed=3)
    n = t.n_batches
    t.run_epoch(0)
    assert int(t.extras["prop_age"]) == n
    t.run_epoch(1)
    assert int(t.extras["prop_age"]) == 2 * n


def test_prop_cache_on_mesh_matches_single(kg_setup):
    """Cached-propagation training must compose with the mesh path: same
    seeds -> same batches; DP+row-sharded tables change only reduction
    order, so per-epoch losses and eval agree with the single-device
    cached run."""
    from hypergraph_diffusion_for_recommendation_tpu.parallel import make_mesh

    _, cf_dev, kg_dev = kg_setup
    cfg = _cfg(prop_cache_steps=4, max_epoch=2, shard_min_rows=64)
    t_single = Trainer(build_model(cfg, cf_dev, kg_dev), seed=5)
    t_mesh = Trainer(build_model(cfg, cf_dev, kg_dev), seed=5,
                     mesh=make_mesh(4, 2))
    for ep in range(2):
        l1, _ = t_single.run_epoch(ep)
        l2, _ = t_mesh.run_epoch(ep)
        assert abs(l1 - l2) < 2e-3, (ep, l1, l2)
    assert int(t_mesh.extras["prop_age"]) == 2 * t_mesh.n_batches
    m1 = t_single.evaluate()
    m2 = t_mesh.evaluate()
    assert abs(m1[20]["recall"] - m2[20]["recall"]) < 5e-3, (m1, m2)


def test_hd3_cached_run_trains(kg_setup, tiny_dataset):
    """Cached propagation on the HD family (dual-view diffusion + SSL):
    trains, learns, and the off path carries no cache state."""
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cf_dev = build_cf_device_data(inter, eval_user_multiple=64)
    cfg = make_config(
        "HGNN_HD3", batch_size=512, hyper_dim=32, item_ranking=(10, 20),
        eval_user_batch=64, max_epoch=12, early_stopping_steps=20,
        lrate=0.01, cl_rate=1e-5, temp=0.2, drop_rate=0.2, reg=0.1,
        prop_cache_steps=4,
    )
    bundle = build_model(cfg, cf_dev)
    result = Trainer(bundle).fit(quiet=True)
    losses = [r.losses["train_loss"] for r in result.history]
    assert np.isfinite(losses).all(), losses
    assert result.best_metrics["recall"] > 0.12, result.best_metrics
    # off path: no cache state
    cfg0 = make_config(
        "HGNN_HD3", batch_size=512, hyper_dim=32, item_ranking=(10,),
        eval_user_batch=64, max_epoch=1, prop_cache_steps=0,
    )
    _, extras0 = build_model(cfg0, cf_dev).init(jax.random.PRNGKey(0))
    assert extras0 == ()
