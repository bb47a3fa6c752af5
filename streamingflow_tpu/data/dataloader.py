"""Dataset -> batched numpy iterator (reference datas/dataloaders.py:10-74).

Single-process prefetching loader: the heavy per-item work (image decode,
rasterisation) runs on host threads while the device executes the previous
step — the TPU-native replacement for torch DataLoader workers.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from ..config import Config


def collate(items):
    """Stack a list of per-sample dicts into a batch dict."""
    out = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals
    return out


class DataLoader:
    """Minimal shuffling/batching loader with background prefetch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = True, prefetch: int = 2,
                 seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        nb = len(self)
        for b in range(nb):
            yield idx[b * self.batch_size:(b + 1) * self.batch_size]

    def __iter__(self) -> Iterator[dict]:
        q: 'queue.Queue' = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        failure: list = []

        def producer():
            try:
                for batch_idx in self._index_batches():
                    items = [self.dataset[int(i)] for i in batch_idx]
                    items = [it for it in items
                             if it.get('status', 'valid') == 'valid']
                    if items:
                        q.put(collate(items))
            except BaseException as e:  # surface worker errors, never hang
                failure.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        if failure:
            raise failure[0]
        self.epoch += 1


def prepare_dataloaders(cfg: Config, return_dataset: bool = False):
    """Build train/val loaders (reference datas/dataloaders.py:10-74)."""
    from .nuscenes import FuturePredictionDataset
    from .nuscenes_sdk import NuScenes

    version = cfg.DATASET.VERSION
    if cfg.DATASET.NAME == 'nuscenes':
        full_version = ('v1.0-mini' if version == 'mini'
                        else f'v1.0-{version}')
        nusc = NuScenes(version=full_version, dataroot=cfg.DATASET.DATAROOT)
        train_ds = FuturePredictionDataset(nusc, 0, cfg)
        val_ds = FuturePredictionDataset(nusc, 1, cfg)
    elif cfg.DATASET.NAME == 'lyft':
        # Lyft L5 ships in the nuScenes table schema; same reader, Lyft
        # split/category semantics (data/lyft.py)
        from .lyft import FuturePredictionDatasetLyft
        nusc = NuScenes(version=version, dataroot=cfg.DATASET.DATAROOT)
        train_ds = FuturePredictionDatasetLyft(nusc, 0, cfg)
        val_ds = FuturePredictionDatasetLyft(nusc, 1, cfg)
    else:
        raise ValueError(f'unknown dataset {cfg.DATASET.NAME}')

    if version == 'mini':
        # reference truncates the mini split (dataloaders.py:18-21)
        train_ds.indices = train_ds.indices[:10]
        val_ds.indices = val_ds.indices[:10]

    train = DataLoader(train_ds, cfg.BATCHSIZE, shuffle=True)
    val = DataLoader(val_ds, cfg.BATCHSIZE, shuffle=False, drop_last=False)
    if return_dataset:
        return train, val, train_ds, val_ds
    return train, val
