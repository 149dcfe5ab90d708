"""Checkpoint / resume (orbax).

The reference is save-only: best `state_dict` written per improvement,
`load()` an unimplemented stub (base/recommender.py:74-75, survey
section 5). Here checkpointing is round-trip: params + optimizer state
+ extras + epoch counter + PRNG key are saved and restored, so training
resumes exactly.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_pure(tree: Any) -> Any:
    return jax.tree.map(np.asarray, tree)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.dir = os.path.abspath(directory)
        os.makedirs(self.dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.dir, options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep)
        )

    def save(self, step: int, params, opt_state, extras, rng) -> None:
        state = {
            "params": _to_pure(params),
            "opt_state": _to_pure(opt_state),
            "extras": _to_pure(extras),
            "rng": np.asarray(rng),
        }
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, step: int | None, template) -> dict | None:
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(_to_pure(template))
        )
        return restored

    def close(self) -> None:
        self._mgr.close()
