"""Checkpoint save/restore via orbax.

Replaces the reference's torch.save checkpointing: SIG3D's
``checkpoint.tar``/``model_last.pth``/best ``model.pth``
(``lib/solver.py:285-287, 457-494, 653-660``) and LAVIS's per-epoch
trainable-only checkpoints with resume of model/optimizer/scaler/epoch
(``runner_base.py:530-596``). Orbax gives async atomic saves and a
keep-last-N policy; "resume" restores the full TrainState pytree.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=True),
        )

    def save(self, step: int, state: Any, metrics: Optional[dict] = None) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics or {})

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
