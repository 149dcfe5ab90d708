"""Numerical parity of the loss formulas against torch implementations
(same formulas as reference util/loss_torch.py, written from their
documented math)."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from hypergraph_diffusion_for_recommendation_tpu.ops import losses as L


def _np(x):
    return np.asarray(x)


def test_bpr_loss_parity(rng):
    u, p, n = (rng.standard_normal((64, 16)).astype(np.float32) for _ in range(3))
    got = float(L.bpr_loss(jnp.asarray(u), jnp.asarray(p), jnp.asarray(n)))
    tu, tp, tn = map(torch.tensor, (u, p, n))
    pos = (tu * tp).sum(1)
    neg = (tu * tn).sum(1)
    want = float((-torch.log(10e-6 + torch.sigmoid(pos - neg))).mean())
    assert abs(got - want) < 1e-6


def test_l2_reg_unsquared_parity(rng):
    a = rng.standard_normal((32, 8)).astype(np.float32)
    b = rng.standard_normal((16, 8)).astype(np.float32)
    got = float(L.l2_reg_loss(0.37, jnp.asarray(a), jnp.asarray(b)))
    want = float(0.37 * (torch.tensor(a).norm(2) + torch.tensor(b).norm(2)))
    assert abs(got - want) < 1e-4


def test_infonce_parity(rng):
    v1 = rng.standard_normal((48, 12)).astype(np.float32)
    v2 = rng.standard_normal((48, 12)).astype(np.float32)
    got = float(L.info_nce(jnp.asarray(v1), jnp.asarray(v2), 0.2))
    t1 = F.normalize(torch.tensor(v1), dim=1)
    t2 = F.normalize(torch.tensor(v2), dim=1)
    pos = torch.exp((t1 * t2).sum(-1) / 0.2)
    ttl = torch.exp(t1 @ t2.T / 0.2).sum(1)
    want = float((-torch.log(pos / ttl + 10e-6)).mean())
    assert abs(got - want) < 1e-4


def test_contrast_loss_parity(rng):
    e1 = rng.standard_normal((40, 8)).astype(np.float32)
    e2 = rng.standard_normal((40, 8)).astype(np.float32)
    nodes = np.unique(rng.integers(0, 40, 20))
    got = float(L.contrast_loss(jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(nodes), 0.5))
    t1 = F.normalize(torch.tensor(e1) + 1e-8, p=2)
    t2 = F.normalize(torch.tensor(e2) + 1e-8, p=2)
    p1, p2 = t1[nodes], t2[nodes]
    nume = torch.exp((p1 * p2).sum(-1) / 0.5)
    deno = torch.exp(p1 @ p2.T / 0.5).sum(-1) + 1e-8
    want = float((-torch.log(nume / deno)).mean())
    assert abs(got - want) < 1e-5


def test_contrast_loss_masked_equals_unique(rng):
    e1 = rng.standard_normal((40, 8)).astype(np.float32)
    e2 = rng.standard_normal((40, 8)).astype(np.float32)
    ids = rng.integers(0, 40, 24)
    uniq = np.unique(ids)
    want = float(L.contrast_loss(jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(uniq), 0.5))
    s, m = L.unique_mask(jnp.asarray(ids))
    got = float(L.contrast_loss_masked(jnp.asarray(e1), jnp.asarray(e2), s, m, 0.5))
    assert abs(got - want) < 1e-5


def test_l2_loss_mean_parity(rng):
    x = rng.standard_normal((24, 6)).astype(np.float32)
    got = float(L.l2_loss_mean(jnp.asarray(x)))
    want = float(torch.mean(torch.sum(torch.pow(torch.tensor(x), 2), dim=1) / 2.0))
    assert abs(got - want) < 1e-6


def test_kl_js_parity(rng):
    p = rng.standard_normal((16, 10)).astype(np.float32)
    q = rng.standard_normal((16, 10)).astype(np.float32)
    got = float(L.kl_divergence(jnp.asarray(p), jnp.asarray(q)))
    tp, tq = torch.tensor(p), torch.tensor(q)
    sp = F.softmax(tp, dim=-1)
    want = float(torch.mean(torch.sum(sp * (F.log_softmax(tp, -1) - F.log_softmax(tq, -1)), 1)))
    assert abs(got - want) < 1e-5
    got_js = float(L.js_divergence(jnp.asarray(p), jnp.asarray(q)))
    sq = F.softmax(tq, dim=-1)
    klp = torch.sum(sp * (F.log_softmax(tp, -1) - F.log_softmax(tq, -1)), 1)
    klq = torch.sum(sq * (F.log_softmax(tq, -1) - F.log_softmax(tp, -1)), 1)
    assert abs(got_js - float(torch.mean(klp + klq))) < 1e-5
