"""Checkpoint / resume (SURVEY.md §5.4).

The reference checkpoints through SB3 model.save/load zips with a
best-model callback (learning/learn_locomotion.py:18-55, 74-80) and
serializes scenes to YAML. Here training state (params, opt state, env
state, rng) is an orbax checkpoint, and `BestModelTracker` reproduces the
save-best-on-improvement callback.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, step: int, state: Any) -> None:
        self.mngr.save(step, args=ocp.args.StandardSave(state))
        self.mngr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        step = self.mngr.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self.mngr.restore(step,
                                     args=ocp.args.StandardRestore(template))
        return self.mngr.restore(step)

    @property
    def latest_step(self):
        return self.mngr.latest_step()


class BestModelTracker:
    """Save-on-new-best semantics (learn_locomotion.py:33-55): track the
    mean episode reward and save when it improves. The best reward is
    persisted to a sidecar file so a resumed run (--resume) does not
    checkpoint its first, possibly worse, iteration as 'best'."""

    def __init__(self, ckpt: Checkpointer):
        self.ckpt = ckpt
        self._sidecar = os.path.join(ckpt.directory, "best_reward.txt")
        self.best = -float("inf")
        if os.path.exists(self._sidecar):
            try:
                with open(self._sidecar) as f:
                    self.best = float(f.read().strip())
            except (ValueError, OSError):
                pass

    def update(self, step: int, mean_reward: float, state: Any) -> bool:
        if mean_reward > self.best:
            self.best = mean_reward
            self.ckpt.save(step, state)
            os.makedirs(self.ckpt.directory, exist_ok=True)
            with open(self._sidecar, "w") as f:
                f.write(repr(float(mean_reward)))
            return True
        return False
