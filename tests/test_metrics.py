"""Metric parity tests: on-device ranking metrics vs an independent
numpy implementation of the reference formulas (util/evaluation.py:8-97)."""

import math

import numpy as np
import jax.numpy as jnp

from hypergraph_diffusion_for_recommendation_tpu.data import (
    build_cf_device_data,
    build_interaction,
)
from hypergraph_diffusion_for_recommendation_tpu.eval import (
    early_stopping,
    metrics_to_host,
    ranking_metrics,
)


def reference_metrics(origin, rec_list, n):
    """Direct numpy transcription of the reference formulas:
    origin: {user: set(test items)}, rec_list: {user: [item ids ranked]}."""
    hits = {u: len(set(origin[u]) & set(rec_list[u][:n])) for u in origin}
    total = sum(len(origin[u]) for u in origin)
    hit_ratio = sum(hits.values()) / total
    precision = sum(hits.values()) / (len(hits) * n)
    recall = np.mean([hits[u] / len(origin[u]) for u in hits])
    ndcg = 0.0
    for u in origin:
        dcg = sum(
            1.0 / math.log2(pos + 2)
            for pos, it in enumerate(rec_list[u][:n])
            if it in origin[u]
        )
        idcg = sum(1.0 / math.log2(pos + 2) for pos in range(min(len(origin[u]), n)))
        ndcg += dcg / idcg
    ndcg /= len(origin)
    return dict(hit_ratio=hit_ratio, precision=precision, recall=recall, ndcg=ndcg)


def test_ranking_metrics_parity(tiny_dataset):
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    dev = build_cf_device_data(inter, eval_user_multiple=64)

    rng = np.random.default_rng(5)
    u_emb = rng.standard_normal((inter.n_users, 16)).astype(np.float32)
    i_emb = rng.standard_normal((inter.n_items, 16)).astype(np.float32)

    top_ns = (5, 10, 20)
    got = metrics_to_host(
        ranking_metrics(
            jnp.asarray(u_emb), jnp.asarray(i_emb), dev.rated_pad, dev.eval_data, top_ns, block=64
        ),
        top_ns,
    )

    # independent reference computation on host
    scores = u_emb @ i_emb.T
    rated = inter.rated_lists()
    test_users, groups, _ = inter.test_lists()
    origin = {}
    rec_list = {}
    for u, g in zip(test_users, groups):
        s = scores[u].copy()
        s[rated[u]] = -1e9
        order = np.argsort(-s, kind="stable")
        rec_list[int(u)] = order[:40].tolist()
        origin[int(u)] = set(int(x) for x in g)  # -2 entries never match: parity

    for n in top_ns:
        want = reference_metrics(origin, rec_list, n)
        for name in ("hit_ratio", "precision", "recall", "ndcg"):
            assert abs(got[n][name] - want[name]) < 2e-4, (n, name, got[n][name], want[name])


def test_unseen_test_items_counted_in_denominators():
    # user 0 trains on items 10,11; tests on item 12 (seen) and raw 999 (unseen)
    train = np.array([[0, 10], [0, 11], [1, 10], [1, 12]])
    test = np.array([[0, 12], [0, 999], [1, 11]])
    inter = build_interaction(train, test)
    dev = build_cf_device_data(inter, eval_user_multiple=8)
    # craft embeddings so user 0 ranks item 12 first among unrated
    u_emb = np.zeros((2, 3), np.float32)
    i_emb = np.zeros((3, 3), np.float32)
    u_emb[0] = [1, 0, 0]
    u_emb[1] = [0, 1, 0]
    i_emb[inter.item[12]] = [1, 1, 0]
    i_emb[inter.item[11]] = [0.5, 0.5, 0]
    got = metrics_to_host(
        ranking_metrics(jnp.asarray(u_emb), jnp.asarray(i_emb), dev.rated_pad, dev.eval_data, (1,), block=8),
        (1,),
    )
    # user0: hits=1 of |test|=2 -> recall 0.5; user1: item 11 top -> hits=1 of 1
    assert abs(got[1]["recall"] - 0.75) < 1e-5
    # hit_ratio = (1+1)/3
    assert abs(got[1]["hit_ratio"] - 2 / 3) < 1e-4
    # ndcg user0: dcg=1, idcg=min(2,1)->1 ; user1: 1 -> mean 1
    assert abs(got[1]["ndcg"] - 1.0) < 1e-5


def test_early_stopping_parity():
    assert early_stopping([0.1, 0.2, 0.15], 2) == (0.2, False)
    assert early_stopping([0.1, 0.2, 0.15, 0.14], 2) == (0.2, True)


def test_early_stopping_smooth_window_one_is_reference_rule():
    series = [0.1, 0.25, 0.2, 0.19, 0.18, 0.21]
    for steps in (1, 2, 3, 5):
        assert early_stopping(series, steps) == early_stopping(series, steps, smooth=1)


def test_early_stopping_smooth_survives_spike():
    """A lone spike at epoch 2 anchors the raw rule's best; with the
    trajectory still climbing underneath, raw patience-3 stops while the
    smoothed signal keeps rising and does not."""
    series = [0.10, 0.30, 0.20, 0.24, 0.28]
    assert early_stopping(series, 3)[1] is True  # raw: spike is 3 epochs old
    best, stop = early_stopping(series, 3, smooth=3)
    assert stop is False
    assert best < 0.30  # best is a window mean, not the raw spike


def test_loss_frozen_detector():
    """Bit-identical tail of epoch losses => frozen (the SHT norm-collapse
    signature); any jitter, or too-short history, => not frozen."""
    from hypergraph_diffusion_for_recommendation_tpu.train.trainer import (
        _FROZEN_EPOCHS,
        _loss_frozen,
    )

    frozen_tail = [1.5, 1.4] + [1.387641] * _FROZEN_EPOCHS
    assert _loss_frozen(frozen_tail) is True
    assert _loss_frozen([1.387641] * (_FROZEN_EPOCHS - 1)) is False
    jitter = [1.5, 1.4] + [1.387641] * (_FROZEN_EPOCHS - 1) + [1.387642]
    assert _loss_frozen(jitter) is False


def test_early_stopping_smooth_still_stops_on_plateau():
    """Smoothing must not disable stopping: once the smoothed series has
    genuinely peaked, patience still fires (shifted by at most ~window)."""
    series = [0.1, 0.2, 0.3, 0.3, 0.3, 0.3, 0.3, 0.3, 0.3]
    _, stop = early_stopping(series, 3, smooth=3)
    assert stop is True


def test_metrics_from_topk_matches_ranking_metrics(tiny_dataset):
    """The precomputed-ids path (distributed eval) must equal the fused path."""
    import jax.numpy as jnp
    from hypergraph_diffusion_for_recommendation_tpu.eval.metrics import (
        metrics_from_topk,
        ranking_metrics,
    )
    from hypergraph_diffusion_for_recommendation_tpu.ops.topk import masked_topk

    train, test = tiny_dataset
    inter = build_interaction(train, test)
    dev = build_cf_device_data(inter, eval_user_multiple=64)
    rng = np.random.default_rng(9)
    u = jnp.asarray(rng.standard_normal((inter.n_users, 16)).astype(np.float32))
    i = jnp.asarray(rng.standard_normal((inter.n_items, 16)).astype(np.float32))

    top_ns = (5, 10, 20)
    fused = metrics_to_host(
        ranking_metrics(u, i, dev.rated_pad, dev.eval_data, top_ns, block=64), top_ns
    )
    ed = dev.eval_data
    scores = jnp.dot(u[ed.test_users], i.T, precision="highest")
    _, ids = masked_topk(scores, dev.rated_pad[ed.test_users], max(top_ns))
    split = metrics_to_host(metrics_from_topk(ids, ed, top_ns, block=64), top_ns)
    assert fused == split


def test_ranking_metrics_block_larger_than_eval_set():
    """Cold-start quartiles pad fewer test users than the configured eval
    block; the block must clamp instead of assert (round-3 matrix fix)."""
    import numpy as np
    import jax.numpy as jnp
    from hypergraph_diffusion_for_recommendation_tpu.eval.metrics import (
        metrics_to_host,
        ranking_metrics,
    )
    from hypergraph_diffusion_for_recommendation_tpu.data.device import (
        build_cf_device_data,
    )
    from hypergraph_diffusion_for_recommendation_tpu.data.dataset import (
        build_interaction,
    )

    rng = np.random.default_rng(0)
    train = np.stack([rng.integers(0, 40, 400), rng.integers(0, 60, 400)], 1)
    test = np.stack([np.arange(40), rng.integers(0, 60, 40)], 1)
    inter = build_interaction(train, test)
    cf = build_cf_device_data(inter, eval_user_multiple=64)
    u = jnp.asarray(rng.standard_normal((inter.n_users, 8)), jnp.float32)
    i = jnp.asarray(rng.standard_normal((inter.n_items, 8)), jnp.float32)
    big = metrics_to_host(
        ranking_metrics(u, i, cf.rated_pad, cf.eval_data, (10,), block=512),
        (10,),
    )
    small = metrics_to_host(
        ranking_metrics(u, i, cf.rated_pad, cf.eval_data, (10,), block=32),
        (10,),
    )
    for k in big[10]:
        np.testing.assert_allclose(big[10][k], small[10][k], rtol=1e-6)
