"""_jit_hoisted: closed-over arrays must leave the compiled module."""

import jax
import jax.numpy as jnp
import numpy as np

from hypergraph_diffusion_for_recommendation_tpu.train.trainer import _jit_hoisted


def test_hoisted_matches_plain_jit_and_strips_constants():
    big = jnp.asarray(np.random.default_rng(0).standard_normal(200_000, ).astype(np.float32))

    def f(x, t):
        return {"y": x * jnp.sum(big) + t["b"], "z": x - t["b"]}

    args = (jnp.ones(8), {"b": jnp.full(8, 2.0)})
    want = jax.jit(f)(*args)
    h = _jit_hoisted(f)
    got = h(*args)  # first call converts
    got2 = h(*args)  # cached path
    for k in want:
        # constant-vs-arg placement can change the sum's reduction order
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5)
        np.testing.assert_allclose(got2[k], want[k], rtol=1e-5)

    # plain jit embeds `big` as a module constant; the hoisted form must not
    plain_size = len(jax.jit(f).lower(*args).as_text())
    assert plain_size > 800_000  # the constant dominates
    flat, _ = jax.tree.flatten(args)
    # reach the converted callable's lowered size through its jit
    state_fn = None
    for cell in h.__closure__ or ():
        if isinstance(cell.cell_contents, dict) and "fn" in cell.cell_contents:
            state_fn = cell.cell_contents
    assert state_fn is not None
    hoisted_size = len(
        state_fn["fn"].lower(state_fn["consts"], [], flat).as_text()
    )
    assert hoisted_size < plain_size / 100


def test_hoisted_epoch_training_still_learns(tiny_dataset):
    """End-to-end: the Trainer (all jit sites hoisted) trains normally."""
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
        "LightGCN", batch_size=512, embedding_size=16, item_ranking=(10,),
        eval_user_batch=64, max_epoch=3, early_stopping_steps=5, lrate=0.05,
    )
    cf = build_cf_device_data(inter, eval_user_multiple=64)
    res = Trainer(build_model(cfg, cf)).fit(quiet=True)
    losses = [r.losses["train_loss"] for r in res.history]
    assert losses[-1] < losses[0]  # actually optimising through the hoisted path


def test_hoisted_donation_aliases_state_and_invalidates_input():
    """donate_args: threaded state buffers are donated to the call; the
    caller's old arrays become unusable, outputs are correct, and
    non-donated args (batch) survive."""
    from hypergraph_diffusion_for_recommendation_tpu.train.trainer import _DONATE

    if not _DONATE:  # HGDR_DONATE=0 escape hatch active in this env
        return

    def step(state, batch):
        return {"w": state["w"] + jnp.sum(batch)}, jnp.sum(state["w"])

    h = _jit_hoisted(step, donate_args=(0,))
    state = {"w": jnp.ones(16)}
    batch = jnp.full(4, 2.0)
    new_state, s = h(state, batch)
    np.testing.assert_allclose(np.asarray(new_state["w"]), np.full(16, 9.0))
    np.testing.assert_allclose(float(s), 16.0)
    assert state["w"].is_deleted()  # donated
    assert not batch.is_deleted()  # kept
    # threading the NEW state keeps working (cached path)
    new2, s2 = h(new_state, batch)
    np.testing.assert_allclose(float(s2), 9.0 * 16)
    np.testing.assert_allclose(np.asarray(new2["w"]), np.full(16, 17.0))


def test_hoisted_donation_guards_const_aliasing():
    """ADVICE r2: a donated state leaf that IS the closed-over const
    array must not delete the cached const (jnp.asarray is a no-op for
    device arrays). Both first-call and later-call aliasing are guarded."""
    from hypergraph_diffusion_for_recommendation_tpu.train.trainer import _DONATE

    if not _DONATE:
        return

    shared = jnp.arange(16, dtype=jnp.float32)

    def step(state, batch):
        # closes over `shared` AND receives it as the donated state leaf
        return {"w": state["w"] + shared[0] + jnp.sum(batch)}, jnp.sum(state["w"])

    h = _jit_hoisted(step, donate_args=(0,))
    batch = jnp.full(4, 1.0)
    # first call: state leaf IS the closure const
    new_state, s = h({"w": shared}, batch)
    np.testing.assert_allclose(float(s), float(np.arange(16).sum()))
    # const survived the donation -> later calls still work
    new2, s2 = h(new_state, batch)
    np.testing.assert_allclose(
        np.asarray(new2["w"]), np.arange(16, dtype=np.float32) + 8.0
    )


def test_background_checkpoint_save_error_propagates(tmp_path):
    """ADVICE r2 (medium): an exception inside the background save worker
    must surface on the next join/save/close, not be swallowed."""
    from hypergraph_diffusion_for_recommendation_tpu.utils.checkpoint import (
        CheckpointManager,
    )

    ckpt = CheckpointManager(str(tmp_path / "ck"), background=True)
    # np.asarray raises on this object inside the worker thread
    class Boom:
        def __array__(self):
            raise ValueError("boom")

    ckpt.save(0, {"w": Boom()}, {}, {}, np.zeros(2, np.uint32))
    import pytest

    with pytest.raises(RuntimeError, match="background checkpoint save failed"):
        ckpt.latest_step()
    # manager remains usable and closes cleanly after the error
    ckpt.save(1, {"w": np.ones(2)}, {}, {}, np.zeros(2, np.uint32))
    assert ckpt.latest_step() == 1
    ckpt.close()
    ckpt.close()  # idempotent
