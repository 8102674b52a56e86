"""Orbax checkpointing of the full training state.

The reference persists model ``state_dict`` files and a buffer pickle with
no optimizer/RNG/loop state (utils.py:57-69, replay_buffer.py:37-65,
SURVEY.md §5 checkpoint row).  Here one checkpoint atomically captures
params (best + contender), the device replay buffer, RNG key, promotion
version, and loop counters, so training resumes exactly."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: Any):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_like)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def restore_raw(self, step: Optional[int] = None) -> Any:
        """Restore a checkpoint as saved, without a target structure —
        for cross-run imports (e.g. seeding a new run's replay buffer from
        another run's checkpoint, the reference's buffer-preload workflow,
        main.py:129)."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(step)

    def close(self):
        self._mgr.close()
