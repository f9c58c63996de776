"""Orbax checkpointing of the full TrainState.

Replaces torch.save(state_dict()) + filename parsing
(tools/trainer.py:137-138,354-363; train.py:138-151) with atomic, versioned
checkpoints carrying explicit metadata — params, optimizer state, step, RNG,
best metric — so resume needs no filename archaeology.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, metrics: dict | None = None,
             force: bool = False):
        self.mgr.save(step, args=ocp.args.StandardSave(state),
                      metrics=metrics, force=force)
        self.mgr.wait_until_finished()

    def restore(self, state_template: Any, step: int | None = None):
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return None
        return self.mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self):
        return self.mgr.latest_step()
