"""Orbax checkpointing with true resume.

The reference only ever saves (SB3 ``.zip`` via CheckpointCallback,
`/root/reference/trainingCode.py:164-168,249-253`) and loads for inference
— there is no resume-training path anywhere (SURVEY.md §5). Here the FULL
train state (params, optimizer state, episode statistics, PRNG key — and
optionally env state) round-trips through Orbax, so training continues
bit-where-it-left-off after preemption.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Save/restore train-state pytrees under ``<dir>/<step>/``."""

    def __init__(self, directory: str, max_to_keep: int = 5,
                 save_interval_steps: int = 1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        if step in self._mgr.all_steps():
            return False  # idempotent: that step is already on disk
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force)
        return bool(saved)

    def restore(self, state_template: Any,
                step: Optional[int] = None) -> Any:
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoints under {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return list(self._mgr.all_steps())

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_params(path: str, params: Any,
                metadata: Optional[dict] = None) -> None:
    """One-shot standalone save (e.g. final model, mirroring
    ``model.save(final)`` at `trainingCode.py:180-181`).

    ``metadata`` (architecture, env dims) is written as a JSON sidecar so
    checkpoints are self-describing — loaders rebuild the exact network
    without out-of-band knowledge (an SB3 .zip stores this too).
    """
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()
    ckptr.close()
    if metadata is not None:
        import json
        with open(os.path.abspath(path) + ".meta.json", "w") as f:
            json.dump(metadata, f, indent=2)


def load_metadata(path: str) -> Optional[dict]:
    """Read a checkpoint's JSON sidecar, if present."""
    import json
    meta_path = os.path.abspath(path) + ".meta.json"
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        return json.load(f)


def load_params(path: str, template: Any) -> Any:
    """Load params saved by :func:`save_params` (inference path,
    mirroring `example_usage.py:37-48`)."""
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(os.path.abspath(path), template)
    ckptr.close()
    return out
