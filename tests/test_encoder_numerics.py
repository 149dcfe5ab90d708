"""Encoder-forward numerics vs independent scipy/numpy computations."""

import numpy as np
import jax
import jax.numpy as jnp

from hypergraph_diffusion_for_recommendation_tpu.core import make_config
from hypergraph_diffusion_for_recommendation_tpu.data import (
    build_cf_device_data,
    build_interaction,
)
from hypergraph_diffusion_for_recommendation_tpu.models import build_model


def _setup(tiny_dataset, name, **kw):
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cf = build_cf_device_data(inter, eval_user_multiple=64)
    cfg = make_config(name, batch_size=256, item_ranking=(10,), eval_user_batch=64, **kw)
    bundle = build_model(cfg, cf)
    params, extras = bundle.init(jax.random.PRNGKey(0))
    return inter, cf, bundle, params, extras


def test_lightgcn_forward_matches_scipy(tiny_dataset):
    inter, cf, bundle, params, extras = _setup(tiny_dataset, "LightGCN", embedding_size=16, n_layers=2)
    u0 = np.asarray(params["params"]["user_emb"])
    i0 = np.asarray(params["params"]["item_emb"])
    a = inter.norm_adj  # scipy
    ego = np.concatenate([u0, i0], axis=0)
    outs = [ego]
    for _ in range(2):
        outs.append(a @ outs[-1])
    want = np.mean(np.stack(outs, 1), 1)
    u_emb, i_emb = bundle.encode_eval(params, extras)
    np.testing.assert_allclose(np.asarray(u_emb), want[: inter.n_users], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(i_emb), want[inter.n_users :], rtol=2e-4, atol=2e-5)


def test_dhcf_forward_matches_scipy(tiny_dataset):
    inter, cf, bundle, params, extras = _setup(tiny_dataset, "DHCF", hyper_dim=16, n_layers=2, p=0.3)
    u0 = np.asarray(params["params"]["user_emb"])
    i0 = np.asarray(params["params"]["item_emb"])
    h = inter.interaction_mat  # raw incidence

    def leaky(x, s=0.3):
        return np.where(x > 0, x, s * x)

    hu = leaky(h @ (h.T @ u0))
    hi = leaky(h.T @ (h @ i0))
    want_u = np.concatenate([u0, hu, hu], axis=1)  # layers not chained (quirk)
    want_i = np.concatenate([i0, hi, hi], axis=1)
    u_emb, i_emb = bundle.encode_eval(params, extras)
    np.testing.assert_allclose(np.asarray(u_emb), want_u, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(i_emb), want_i, rtol=2e-4, atol=2e-4)


def test_sht_forward_matches_numpy(tiny_dataset):
    inter, cf, bundle, params, extras = _setup(
        tiny_dataset, "SHT", hyper_dim=16, n_layers=2, hyperedge_num=8
    )
    p = params["params"]
    u0, i0 = np.asarray(p["user_emb"]), np.asarray(p["item_emb"])
    uh, ih = np.asarray(p["user_hyper"]), np.asarray(p["item_hyper"])
    a = inter.norm_adj
    ego = np.concatenate([u0, i0], axis=0)
    lats = [ego]
    for _ in range(2):
        lats.append(a @ lats[-1])
    emb = sum(lats)
    want_u = emb[: inter.n_users] @ (uh.T @ uh)
    want_i = emb[inter.n_users :] @ (ih.T @ ih)
    got_u, got_i = bundle.encode_eval(params, extras)
    np.testing.assert_allclose(np.asarray(got_u), want_u, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_i), want_i, rtol=3e-4, atol=3e-4)
