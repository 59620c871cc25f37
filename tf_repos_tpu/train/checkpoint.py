"""Checkpoint / resume via Orbax.

Reference semantics being reproduced (SURVEY.md §5 checkpoint/resume):
automatic model_dir checkpoints with resume-on-restart (Estimator
behavior), date-partitioned model_dir warm-start (DeepFM.py:286-288),
destructive reset via --clear_existing_model (DeepFM.py:318-324), and
keep-N retention. Sharded embedding tables are saved as sharded
TensorStore arrays by Orbax natively.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, model_dir: str, keep: int = 5, save_interval_steps: int = 0):
        self.model_dir = os.path.abspath(model_dir)
        os.makedirs(self.model_dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.model_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                save_interval_steps=max(save_interval_steps, 1),
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, tree: Any, force: bool = False) -> bool:
        return self._mgr.save(step, args=ocp.args.StandardSave(tree), force=force)

    def should_save(self, step: int) -> bool:
        """True when save_interval_steps would accept this step (cheap
        pre-check so the harness can skip building the save tree)."""
        return bool(self._mgr.should_save(step))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, tree_like: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(tree_like))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def clear_existing_model(model_dir: str) -> None:
    """--clear_existing_model: rm -rf model_dir (DeepFM.py:318-324)."""
    try:
        shutil.rmtree(model_dir)
        print(f"existing model cleaned at {model_dir}")
    except Exception as e:  # reference prints and continues
        print(e, "at clear_existing_model")
