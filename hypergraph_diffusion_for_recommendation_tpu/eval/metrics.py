"""Fully on-device ranking evaluation.

Replaces the reference's per-user host loop (base/main_recommender.py:
64-100: GPU matvec → .cpu() per user → dict masking → numba top-k →
Python set metrics, survey 3.3) with one jit'd pipeline: blocked
score-matmul (MXU) → scatter rated-mask → lax.top_k → vectorised
Hit/Precision/Recall/NDCG.

Metric formulas are bit-parity with `util/evaluation.py`:
  hits[u]    = |top_N(u) ∩ test(u)|                      (:8-15)
  hit_ratio  = Σ_u hits[u] / Σ_u |test(u)|               (:17-30)
  precision  = Σ_u hits[u] / (n_test_users * N)          (:44-47)
  recall     = mean_u hits[u] / |test(u)|                (:49-53)
  NDCG       = mean_u DCG_u / IDCG_u,
               DCG  = Σ_{n: top[n] ∈ test(u)} 1/log2(n+2),
               IDCG = Σ_{n < min(|test(u)|, N)} 1/log2(n+2)   (:84-97)
where |test(u)| counts ALL of u's test items — including items never
seen in training (encoded as id -2, unretrievable but still in the
denominators; parity with ui_graph.py:63-68 + evaluation.py:94).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data.device import EvalData
from ..ops.topk import masked_topk


def _discount_table(max_n: int) -> jnp.ndarray:
    """ctable[k] = sum_{n<k} 1/log2(n+2), k in [0, max_n]."""
    d = 1.0 / np.log2(np.arange(max_n) + 2.0)
    return jnp.asarray(np.concatenate([[0.0], np.cumsum(d)]), jnp.float32)


@partial(jax.jit, static_argnames=("top_ns", "block"))
def ranking_metrics(
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    rated_pad: jnp.ndarray,
    eval_data: EvalData,
    top_ns: tuple[int, ...] = (10, 20, 40),
    block: int = 256,
) -> dict:
    """Returns {"hit_ratio": [len(top_ns)], "precision": ..., "recall": ...,
    "ndcg": ...} as device arrays ordered like `top_ns`."""
    max_n = max(top_ns)
    n_pad = eval_data.test_users.shape[0]
    if n_pad == 0:
        raise ValueError(
            "ranking_metrics: empty eval set (0 padded test users) — "
            "e.g. a cold-start quartile with no test users; nothing to score"
        )
    # small eval sets (e.g. a cold-start quartile) can be padded shorter
    # than the configured block: clamp so one block covers them
    block = min(block, n_pad)
    assert n_pad % block == 0, (n_pad, block)
    n_blocks = n_pad // block

    users = eval_data.test_users.reshape(n_blocks, block)
    valid = eval_data.user_valid.reshape(n_blocks, block)
    test_pos = eval_data.test_pos_pad.reshape(n_blocks, block, -1)
    counts = eval_data.test_counts.reshape(n_blocks, block)

    disc = _discount_table(max_n)
    pos_disc = 1.0 / jnp.log2(jnp.arange(max_n, dtype=jnp.float32) + 2.0)

    def body(carry, inp):
        u_blk, v_blk, tp_blk, cnt_blk = inp
        # precision='highest' keeps f32 MXU passes: the TPU default
        # (bf16 inputs) perturbs scores enough to reorder near-ties and
        # break metric parity with the fp32 reference.
        scores = jnp.dot(user_emb[u_blk], item_emb.T, precision="highest")  # [B, I]
        _, top_ids = masked_topk(scores, rated_pad[u_blk], max_n)
        # membership: [B, max_n] — does top item n appear in u's test set?
        hit_mat = jnp.any(top_ids[:, :, None] == tp_blk[:, None, :], axis=-1)
        hit_f = hit_mat.astype(jnp.float32)
        vf = v_blk.astype(jnp.float32)

        stats = []
        for n in top_ns:
            hits_n = jnp.sum(hit_f[:, :n], axis=1)
            dcg_n = jnp.sum(hit_f[:, :n] * pos_disc[:n], axis=1)
            idcg_n = disc[jnp.minimum(cnt_blk, n)]
            ndcg_n = jnp.where(idcg_n > 0, dcg_n / jnp.maximum(idcg_n, 1e-12), 0.0)
            rec_n = hits_n / jnp.maximum(cnt_blk.astype(jnp.float32), 1.0)
            stats.append(
                jnp.stack(
                    [jnp.sum(hits_n * vf), jnp.sum(rec_n * vf), jnp.sum(ndcg_n * vf)]
                )
            )
        return carry + jnp.stack(stats), None

    init = jnp.zeros((len(top_ns), 3), jnp.float32)
    total, _ = jax.lax.scan(body, init, (users, valid, test_pos, counts))

    n_users = jnp.float32(eval_data.n_test_users)
    n_inter = jnp.float32(eval_data.total_test_interactions)
    ns = jnp.asarray(top_ns, jnp.float32)
    return {
        "hit_ratio": total[:, 0] / jnp.maximum(n_inter, 1.0),
        "precision": total[:, 0] / jnp.maximum(n_users * ns, 1.0),
        "recall": total[:, 1] / jnp.maximum(n_users, 1.0),
        "ndcg": total[:, 2] / jnp.maximum(n_users, 1.0),
    }


@partial(jax.jit, static_argnames=("top_ns", "block"))
def metrics_from_topk(
    top_ids: jnp.ndarray,
    eval_data: EvalData,
    top_ns: tuple[int, ...] = (10, 20, 40),
    block: int = 256,
) -> dict:
    """Ranking metrics from PRE-COMPUTED top-max_n ids per padded test
    user (the distributed-top-k eval path: ids come from
    parallel/topk.sharded_user_topk)."""
    n_pad = eval_data.test_users.shape[0]
    if n_pad == 0:
        raise ValueError(
            "metrics_from_topk: empty eval set (0 padded test users) — "
            "e.g. a cold-start quartile with no test users; nothing to score"
        )
    block = min(block, n_pad)  # small eval sets: one block covers them
    assert n_pad % block == 0, (n_pad, block)
    n_blocks = n_pad // block
    max_n = max(top_ns)

    valid = eval_data.user_valid.reshape(n_blocks, block)
    test_pos = eval_data.test_pos_pad.reshape(n_blocks, block, -1)
    counts = eval_data.test_counts.reshape(n_blocks, block)
    ids = top_ids.reshape(n_blocks, block, -1)

    disc = _discount_table(max_n)
    pos_disc = 1.0 / jnp.log2(jnp.arange(max_n, dtype=jnp.float32) + 2.0)

    def body(carry, inp):
        ids_blk, v_blk, tp_blk, cnt_blk = inp
        hit_f = jnp.any(ids_blk[:, :, None] == tp_blk[:, None, :], axis=-1).astype(jnp.float32)
        vf = v_blk.astype(jnp.float32)
        stats = []
        for n in top_ns:
            hits_n = jnp.sum(hit_f[:, :n], axis=1)
            dcg_n = jnp.sum(hit_f[:, :n] * pos_disc[:n], axis=1)
            idcg_n = disc[jnp.minimum(cnt_blk, n)]
            ndcg_n = jnp.where(idcg_n > 0, dcg_n / jnp.maximum(idcg_n, 1e-12), 0.0)
            rec_n = hits_n / jnp.maximum(cnt_blk.astype(jnp.float32), 1.0)
            stats.append(
                jnp.stack([jnp.sum(hits_n * vf), jnp.sum(rec_n * vf), jnp.sum(ndcg_n * vf)])
            )
        return carry + jnp.stack(stats), None

    init = jnp.zeros((len(top_ns), 3), jnp.float32)
    total, _ = jax.lax.scan(body, init, (ids, valid, test_pos, counts))
    n_users = jnp.float32(eval_data.n_test_users)
    n_inter = jnp.float32(eval_data.total_test_interactions)
    ns = jnp.asarray(top_ns, jnp.float32)
    return {
        "hit_ratio": total[:, 0] / jnp.maximum(n_inter, 1.0),
        "precision": total[:, 0] / jnp.maximum(n_users * ns, 1.0),
        "recall": total[:, 1] / jnp.maximum(n_users, 1.0),
        "ndcg": total[:, 2] / jnp.maximum(n_users, 1.0),
    }


def metrics_to_host(metrics: dict, top_ns: tuple[int, ...]) -> dict:
    """Device dict -> {N: {metric: float rounded to 5 (parity with the
    reference's round(x, 5), evaluation.py:30-97)}}.

    ONE device_get for the whole dict: per-scalar np.asarray fetches cost
    a blocking device->host roundtrip EACH — through the axon remote
    tunnel that was 12 roundtrips = ~315 ms of a 319 ms steady eval
    (99%% of eval latency; profiled round 4, BENCH_NOTES)."""
    host = jax.device_get(metrics)
    out = {}
    for k, n in enumerate(top_ns):
        out[int(n)] = {
            name: round(float(host[name][k]), 5)
            for name in ("hit_ratio", "precision", "recall", "ndcg")
        }
    return out
