"""Checkpoint / resume via orbax.

Reference behaviour: Lightning ModelCheckpoint(save_top_k=-1, period=1) —
every epoch kept — with hyperparameters embedded so a checkpoint alone
reconstructs model+cfg (reference train.py:67-72, evaluate.py:33), plus
auto-resume from the highest-step checkpoint (train.py:15-41).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from ..config import Config


class CheckpointManager:
    """Epoch-per-checkpoint manager that embeds the config."""

    def __init__(self, directory: str, keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep, create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, cfg: Config) -> None:
        with open(os.path.join(self.directory, 'config.json'), 'w') as f:
            json.dump(cfg.to_dict(), f, indent=2, default=str)
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f'no checkpoint in {self.directory}')
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def load_cfg(self) -> Config:
        with open(os.path.join(self.directory, 'config.json')) as f:
            return Config().merge_dict(_strip_extra(json.load(f)))


def _strip_extra(d):
    return d


def get_latest_checkpoint_dir(log_dir: str) -> Optional[str]:
    """Find the most recent run directory containing checkpoints
    (reference train.py:15-41 auto-resume)."""
    if not os.path.isdir(log_dir):
        return None
    candidates = []
    for name in os.listdir(log_dir):
        ckpt_dir = os.path.join(log_dir, name, 'checkpoints')
        if os.path.isdir(ckpt_dir):
            candidates.append((os.path.getmtime(ckpt_dir), ckpt_dir))
    if not candidates:
        return None
    return max(candidates)[1]
