"""Optimizers + ReduceLROnPlateau equivalent.

The reference trains with torch.optim.Adam(lr, weight_decay) — COUPLED
L2 weight decay added to the gradient before the moment updates (not
decoupled AdamW) — and steps ReduceLROnPlateau('min', factor=lr_decay,
patience=10) on the epoch train loss (KHGRec.py:41-42, HGNN_HD3.py:47-48).
Both are reproduced exactly: `adam_coupled_wd` chains the decay ahead of
Adam scaling; `PlateauState` mirrors torch's rel-threshold logic.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import optax


def adam_coupled_wd(learning_rate: float, weight_decay: float = 0.0) -> optax.GradientTransformation:
    txs = []
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_adam())
    txs.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*txs)


def make_optimizer(lrate: float, weight_decay: float) -> optax.GradientTransformation:
    """inject_hyperparams wrapper so the trainer can anneal the lr
    in-place between epochs (plateau schedule) without re-jitting."""

    def factory(learning_rate):
        return adam_coupled_wd(learning_rate, weight_decay)

    return optax.inject_hyperparams(factory)(learning_rate=lrate)


def set_lr(opt_state, lr: float):
    import jax.numpy as jnp

    # keep the leaf a committed f32 scalar so the jitted epoch does not
    # retrace when the plateau schedule changes the lr
    opt_state.hyperparams["learning_rate"] = jnp.float32(lr)
    return opt_state


@dataclass
class PlateauState:
    """torch.optim.lr_scheduler.ReduceLROnPlateau('min') equivalent
    (threshold=1e-4 rel, cooldown=0, min_lr=0 — torch defaults)."""

    lr: float
    factor: float
    patience: int
    best: float = float("inf")
    num_bad: int = 0
    threshold: float = 1e-4

    def step(self, metric: float) -> "PlateauState":
        if metric < self.best * (1.0 - self.threshold):
            return replace(self, best=metric, num_bad=0)
        num_bad = self.num_bad + 1
        if num_bad > self.patience:
            return replace(self, lr=self.lr * self.factor, num_bad=0)
        return replace(self, num_bad=num_bad)
