"""Orbax checkpoint/resume for the training loop.

Persists the FULL TrainState (params + optimizer state + step), unlike the
final-params .npz export in train.py: a preempted multi-hour fine-tune
resumes bit-exact, AdamW moments included. Works with sharded states — the
restore target is the live (sharded) state, so orbax lays tensors back out
on the same mesh.
"""

from __future__ import annotations

import pathlib
from typing import Optional

import orbax.checkpoint as ocp

from monst3r_slam_tpu.train.step import TrainState


def make_manager(ckpt_dir, max_to_keep: int = 3) -> ocp.CheckpointManager:
    path = pathlib.Path(ckpt_dir).resolve()
    path.mkdir(parents=True, exist_ok=True)  # (orbax's create= is deprecating)
    return ocp.CheckpointManager(
        path,
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save(mngr: ocp.CheckpointManager, state: TrainState) -> None:
    mngr.save(int(state.step), args=ocp.args.StandardSave(state))


def restore_latest(
    mngr: ocp.CheckpointManager, like: TrainState
) -> Optional[TrainState]:
    """Restore the newest checkpoint with `like`'s treedef/shardings, or
    None when the directory holds no checkpoint yet."""
    step = mngr.latest_step()
    if step is None:
        return None
    return mngr.restore(step, args=ocp.args.StandardRestore(like))
