"""Sequential family tests (SASRec, CL4SRec)."""

import pytest

# per-model learning tests (many training epochs on the virtual CPU
# mesh) live in the slow tier; `pytest -q -m slow` runs them
pytestmark = pytest.mark.slow

import numpy as np
import pytest

from hypergraph_diffusion_for_recommendation_tpu.core import make_config
from hypergraph_diffusion_for_recommendation_tpu.data import (
    build_cf_device_data,
    build_interaction,
)
from hypergraph_diffusion_for_recommendation_tpu.models import build_model
from hypergraph_diffusion_for_recommendation_tpu.train import Trainer


@pytest.mark.parametrize("name", ["SASRec", "CL4SRec"])
def test_sequential_learns(tiny_dataset, name):
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cfg = make_config(
        name, batch_size=64, embedding_size=32, n_layers=2, drop_rate=0.2,
        item_ranking=(10, 20), eval_user_batch=64, max_epoch=15,
        early_stopping_steps=15, lrate=0.001, cl_rate=0.1, temp=1.0,
    )
    cf = build_cf_device_data(inter, eval_user_multiple=64)
    bundle = build_model(cfg, cf)
    assert bundle.batch_kind == "sequence"
    r = Trainer(bundle).fit(quiet=True)
    losses = [h.losses["train_loss"] for h in r.history]
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0]
    assert r.best_metrics["recall"] > 0.15, (name, r.best_metrics)


def test_seq_window_semantics(tiny_dataset):
    from hypergraph_diffusion_for_recommendation_tpu.models.sasrec import build_seq_from_cf

    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cf = build_cf_device_data(inter)
    sd = build_seq_from_cf(cf, max_len=50)
    seq = np.asarray(sd.seq)
    y = np.asarray(sd.y)
    sl = np.asarray(sd.seq_len)
    valid = np.asarray(sd.seq_valid)
    # targets are the inputs shifted by one
    for k in np.where(valid)[0][:20]:
        assert np.array_equal(seq[k, 1 : sl[k]], y[k, : sl[k] - 1])
        assert (seq[k, : sl[k]] > 0).all()
        assert (seq[k, sl[k] :] == 0).all()


def test_seq_augment_semantics():
    """crop/mask/reorder views match SequenceAugmentor semantics
    (reference data/augmentor.py:71-97)."""
    import jax
    import jax.numpy as jnp

    from hypergraph_diffusion_for_recommendation_tpu.models.sasrec import _seq_augment

    rng = np.random.default_rng(3)
    b, L = 64, 20
    seq = np.zeros((b, L), np.int32)
    seq_len = rng.integers(4, L, size=b)
    for i in range(b):
        seq[i, : seq_len[i]] = rng.permutation(100)[: seq_len[i]] + 1
    pos = np.tile(np.arange(1, L + 1), (b, 1)).astype(np.int32) * (seq > 0)

    for trial in range(4):
        key = jax.random.PRNGKey(trial)
        out, out_pos = _seq_augment(
            key, jnp.asarray(seq), jnp.asarray(pos), jnp.asarray(seq_len), 100
        )
        out = np.asarray(out)
        out_pos = np.asarray(out_pos)
        choice = np.asarray(
            jax.random.randint(jax.random.split(key, 5)[0], (b,), 0, 3)
        )
        for i in range(b):
            live_in = set(seq[i, : seq_len[i]].tolist())
            live_out = [v for v in out[i].tolist() if v > 0]
            if choice[i] == 0:  # crop: contiguous window moved to front
                n = len(live_out)
                assert 1 <= n <= seq_len[i]
                # the window is a contiguous subsequence of the original
                flat = seq[i, : seq_len[i]].tolist()
                joined = ",".join(map(str, live_out))
                assert joined in ",".join(map(str, flat)), (live_out, flat)
                # positions renumbered 1..n
                assert out_pos[i, :n].tolist() == list(range(1, n + 1))
            elif choice[i] == 1:  # mask: subset, order preserved
                it = iter(seq[i].tolist())
                assert all(any(v == w for w in it) for v in live_out)
                assert set(live_out) <= live_in
            else:  # reorder: same multiset, same length
                assert sorted(live_out) == sorted(live_in)
                # out-of-window prefix/suffix stay fixed: at least the
                # pad tail is untouched
                assert (out[i, seq_len[i]:] == 0).all()
