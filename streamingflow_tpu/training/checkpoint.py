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

    def restore_raw(self, step: Optional[int] = None) -> Any:
        """Restore without a template (raw pytree of arrays) — for partial /
        cross-model loads such as the single-frame warm start."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f'no checkpoint in {self.directory}')
        return self._mgr.restore(step)


def warm_start(state: Any, pretrained_dir: str, drop: str = 'decoder'
               ) -> Tuple[Any, int]:
    """Partial load of a (possibly single-frame) pretrained checkpoint,
    dropping any path containing ``drop`` — reference train.py:50-58
    ('remove decoder weights, strict=False').

    Only leaves that exist in the current tree with identical shapes are
    copied.  Returns (new_state, n_loaded_leaves)."""
    from ..utils.torch_convert import flatten_tree, unflatten_tree

    raw = CheckpointManager(pretrained_dir).restore_raw()
    src = {'params': raw.get('params', {}),
           'batch_stats': raw.get('batch_stats', {})}
    dst = {'params': state.params, 'batch_stats': state.batch_stats}
    flat_src = flatten_tree(jax.tree.map(lambda x: x, src))
    flat_dst = flatten_tree(jax.tree.map(lambda x: x, dst))
    n = 0
    for path, v in flat_src.items():
        if drop in path or path not in flat_dst:
            continue
        if tuple(getattr(v, 'shape', ())) != tuple(flat_dst[path].shape):
            continue
        flat_dst[path] = v
        n += 1
    merged = unflatten_tree(flat_dst)
    return state.replace(params=merged['params'],
                         batch_stats=merged['batch_stats']), n


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
