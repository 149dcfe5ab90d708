"""End-to-end training smoke + learning tests (MF, LightGCN)."""

import numpy as np

from hypergraph_diffusion_for_recommendation_tpu.core import make_config
from hypergraph_diffusion_for_recommendation_tpu.data import (
    build_cf_device_data,
    build_interaction,
)
from hypergraph_diffusion_for_recommendation_tpu.models import build_model
from hypergraph_diffusion_for_recommendation_tpu.train import Trainer


def _fit(model_name, tiny_dataset, epochs, **cfg_kw):
    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cfg = make_config(
        model_name,
        batch_size=512,
        embedding_size=32,
        item_ranking=(10, 20),
        eval_user_batch=64,
        max_epoch=epochs,
        early_stopping_steps=epochs,
        **cfg_kw,
    )
    cf = build_cf_device_data(inter, eval_user_multiple=cfg.eval_user_batch)
    bundle = build_model(cfg, cf)
    trainer = Trainer(bundle)
    result = trainer.fit(quiet=True)
    return result


def test_mf_learns(tiny_dataset):
    result = _fit("MF", tiny_dataset, epochs=30, lrate=0.05)
    losses = [r.losses["train_loss"] for r in result.history]
    assert losses[-1] < losses[0] * 0.7, losses
    # planted-structure synthetic: random embeddings give recall@20 ~ N/I
    # (~0.07); a trained model must far exceed it
    assert result.best_metrics["recall"] > 0.15, result.best_metrics


def test_lightgcn_learns(tiny_dataset):
    result = _fit("LightGCN", tiny_dataset, epochs=30, lrate=0.05)
    assert result.best_metrics["recall"] > 0.15, result.best_metrics
    # history records both cutoffs
    assert set(result.history[0].metrics) == {10, 20}


def test_plateau_reduces_lr():
    from hypergraph_diffusion_for_recommendation_tpu.train import PlateauState

    p = PlateauState(lr=1.0, factor=0.5, patience=2)
    p = p.step(1.0)
    for _ in range(3):
        p = p.step(1.0)  # no improvement
    assert p.lr == 0.5


def test_chunked_epoch_matches_single_execution(tiny_dataset):
    """The chunked-execution path (pallas DMA-budget mitigation) must be
    step-for-step identical to the single-execution epoch scan."""
    import jax

    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cf = build_cf_device_data(inter, eval_user_multiple=64)

    def run(chunk):
        cfg = make_config(
            "LightGCN", batch_size=256, embedding_size=16, item_ranking=(10, 20),
            eval_user_batch=64, max_epoch=3, early_stopping_steps=5,
            scan_chunk_steps=chunk,
        )
        tr = Trainer(build_model(cfg, cf), seed=11)
        losses = [tr.run_epoch(ep)[0] for ep in range(3)]
        return tr.params, losses, tr.n_batches

    p_single, l_single, nb = run(0)
    # a chunk length that does NOT divide n_batches exercises the masked tail
    chunk = max(nb // 2 - 1, 1)
    assert nb % chunk != 0 or chunk < nb
    p_chunked, l_chunked, _ = run(chunk)
    np.testing.assert_allclose(np.asarray(l_single), np.asarray(l_chunked), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_single), jax.tree.leaves(p_chunked)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_profile_epoch_writes_trace(tiny_dataset, tmp_path):
    """profile_epoch must run a real epoch under jax.profiler and leave
    an xplane trace on disk (aux subsystem, SURVEY section 5)."""
    import glob

    from hypergraph_diffusion_for_recommendation_tpu.core import make_config
    from hypergraph_diffusion_for_recommendation_tpu.data import (
        build_cf_device_data,
        build_interaction,
    )
    from hypergraph_diffusion_for_recommendation_tpu.models import build_model
    from hypergraph_diffusion_for_recommendation_tpu.train import Trainer

    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cfg = make_config(
        "MF", batch_size=256, embedding_size=16, item_ranking=(10,),
        eval_user_batch=64, max_epoch=1,
    )
    t = Trainer(build_model(cfg, build_cf_device_data(inter, eval_user_multiple=64)))
    loss, _ = t.profile_epoch(str(tmp_path), 0)
    assert float(loss) == loss  # finite scalar came back
    assert glob.glob(str(tmp_path) + "/**/*.xplane.pb", recursive=True), "no trace written"


def test_evaluate_every_cadence(tiny_dataset):
    """evaluate_every > 1 reuses the previous metrics on the skipped
    epochs (reference main.py:92-93 cadence). (The async_eval mode this
    cadence used to interact with was removed — measured 0% overlap,
    scripts/eval_overlap_mesh.py.)"""
    res = _fit("MF", tiny_dataset, epochs=6, lrate=0.05, evaluate_every=3)
    h = res.history
    assert len(h) == 6
    assert h[0].metrics == h[1].metrics == h[2].metrics
    assert h[3].metrics == h[4].metrics == h[5].metrics


def test_nan_guard_fails_fast(tiny_dataset, monkeypatch):
    """A non-finite epoch loss must raise with actionable context (the
    reference's KGAT NaN checks / HD3 detect_anomaly equivalent)."""
    import pytest

    train, test = tiny_dataset
    inter = build_interaction(train, test)
    cfg = make_config("MF", batch_size=512, max_epoch=2, item_ranking=(10,))
    cf = build_cf_device_data(inter, eval_user_multiple=64)
    trainer = Trainer(build_model(cfg, cf))
    fn = trainer._epoch_fn

    def poisoned(params, opt_state, extras, rng):
        p, o, e, loss, aux = fn(params, opt_state, extras, rng)
        return p, o, e, loss * float("nan"), aux

    monkeypatch.setattr(trainer, "_epoch_fn", poisoned)
    with pytest.raises(FloatingPointError, match="non-finite train loss"):
        trainer.fit(quiet=True)
