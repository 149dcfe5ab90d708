"""Lock the round-4 eval finding: the reference's find_k_largest emits
duplicate ids; our eval is bit-identical to an exact stable top-K.

Uses RANDOM score rows (no training) so the whole check runs in the fast
tier. Skips when the read-only reference tree is unavailable (the parity
sandbox can't be built)."""

import os

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference/HD_SELFRec"


@pytest.fixture(scope="module")
def ref_eval():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree not available")
    from scripts.cross_eval_check import load_ref_eval
    from scripts.run_parity import ensure_sandbox

    ensure_sandbox()
    return load_ref_eval()


def test_reference_topk_duplicates(ref_eval):
    find_k_largest, _ = ref_eval
    rng = np.random.default_rng(0)
    dups = 0
    for _ in range(20):
        cand = rng.normal(size=600).astype(np.float32)
        ids, _scores = find_k_largest(40, cand)
        assert len(ids) == 40
        dups += 40 - len(set(ids))
    # the defect: ~2.4 duplicate slots per top-40 at this catalog size
    assert dups > 10, f"expected duplicate ids from the reference top-K, got {dups}"


def test_our_topk_matches_exact_stable(ref_eval):
    """lax.top_k == lexsort-stable exact top-k on random near-tie scores."""
    import jax

    from hypergraph_diffusion_for_recommendation_tpu.ops.topk import topk_ids

    rng = np.random.default_rng(1)
    # quantised scores force ties; stable order must break them by id
    scores = np.round(rng.normal(size=(32, 600)), 2).astype(np.float32)
    _, got = topk_ids(jax.numpy.asarray(scores), 40)
    got = np.asarray(got)
    for r in range(32):
        c = scores[r]
        # FULL stable sort by (-score, id): argpartition is arbitrary
        # about which of boundary-tied items enters the top-k
        want = np.lexsort((np.arange(c.shape[0]), -c))[:40]
        assert np.array_equal(got[r], want), r


def test_reference_eval_deflates_recall(ref_eval):
    """On shared scores, the reference's eval loses recall vs exact
    top-k (duplicates crowd out real candidates)."""
    find_k_largest, ranking_evaluation = ref_eval
    rng = np.random.default_rng(2)
    n_users, n_items, k = 150, 600, 20
    scores = rng.normal(size=(n_users, n_items)).astype(np.float32)
    # each user: 8 'test' items planted among the top-50 scores so hits
    # are plausible under both evals
    origin = {}
    for u in range(n_users):
        top50 = np.argsort(-scores[u])[:50]
        origin[u] = {int(i): 1 for i in rng.choice(top50, size=8, replace=False)}

    rec_ref, rec_true = {}, {}
    for u in range(n_users):
        ids, ss = find_k_largest(40, scores[u])
        rec_ref[u] = list(zip(ids, ss))
        c = scores[u]
        part = np.argpartition(-c, 39)[:40]
        order = np.lexsort((part, -c[part]))
        rec_true[u] = [(int(i), float(c[i])) for i in part[order]]

    def recall_at(rec, n):
        out = ranking_evaluation(origin, rec, [n])
        for line in out:
            if line.startswith("Recall"):
                return float(line.strip().split(":")[1])
        raise AssertionError(out)

    r_ref = recall_at(rec_ref, k)
    r_true = recall_at(rec_true, k)
    assert r_ref < r_true, (r_ref, r_true)
