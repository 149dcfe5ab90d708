"""Checkpoint / resume (orbax).

The reference is save-only: best `state_dict` written per improvement,
`load()` an unimplemented stub (base/recommender.py:74-75, survey
section 5). Here checkpointing is round-trip: params + optimizer state
+ extras + epoch counter + PRNG key are saved and restored, so training
resumes exactly.

Saves run in a BACKGROUND thread by default: the device→host pull (the
expensive part through a tunnelled TPU backend) and the orbax write
overlap the next training epoch. One save is in flight at a time; any
read (latest_step / restore / close) joins the pending save first. The
caller must hand the save its own buffers when donation is on — the
Trainer passes device copies of the live train state (see
train/trainer.py fit), so the next epoch's dispatch cannot invalidate
what the thread is reading.
"""

from __future__ import annotations

import atexit
import os
import threading
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_pure(tree: Any) -> Any:
    return jax.tree.map(np.asarray, tree)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 background: bool = True):
        self.dir = os.path.abspath(directory)
        os.makedirs(self.dir, exist_ok=True)
        self.background = background
        self._thread: threading.Thread | None = None
        self._worker_exc: BaseException | None = None
        self._closed = False
        self._mgr = ocp.CheckpointManager(
            self.dir, options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep)
        )
        # The worker is a daemon thread: without this hook an in-flight
        # final save is killed at interpreter exit and silently lost.
        self._atexit = atexit.register(self.close)

    def _join(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        self._mgr.wait_until_finished()
        if self._worker_exc is not None:
            exc, self._worker_exc = self._worker_exc, None
            raise RuntimeError("background checkpoint save failed") from exc

    def _do_save(self, step: int, params, opt_state, extras, rng) -> None:
        try:
            state = {
                "params": _to_pure(params),
                "opt_state": _to_pure(opt_state),
                "extras": _to_pure(extras),
                "rng": np.asarray(rng),
            }
            self._mgr.save(step, args=ocp.args.StandardSave(state))
            self._mgr.wait_until_finished()
        except BaseException as e:  # re-raised on the next _join()
            self._worker_exc = e

    def save(self, step: int, params, opt_state, extras, rng) -> None:
        """Queue (background) or perform (foreground) one save.

        Background mode: joins any previous in-flight save, then pulls
        and writes this one on a worker thread. The handed-in arrays
        must stay valid until the save completes — pass copies when the
        live buffers are donated to the next dispatch."""
        self._join()
        if not self.background:
            self._do_save(step, params, opt_state, extras, rng)
            return
        self._thread = threading.Thread(
            target=self._do_save, args=(step, params, opt_state, extras, rng),
            daemon=True,
        )
        self._thread.start()

    def latest_step(self) -> int | None:
        self._join()
        return self._mgr.latest_step()

    def restore(self, step: int | None, template) -> dict | None:
        self._join()
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(_to_pure(template))
        )
        return restored

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        atexit.unregister(self._atexit)
        try:
            self._join()
        finally:
            self._mgr.close()
