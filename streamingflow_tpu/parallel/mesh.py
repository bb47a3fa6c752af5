"""Device mesh + data-parallel step construction.

The TPU-native replacement for the reference's DDP/NCCL stack
(train.py:78-88, mmdet3d/ops/norm.py NaiveSyncBatchNorm,
metrics dist_reduce_fx='sum'): one jitted train step whose inputs carry
`NamedSharding`s over a 1-D 'data' mesh.  XLA inserts psum collectives for
the gradient all-reduce; BN statistics follow the same mechanism because
the batch axis is sharded while parameters are replicated.

Multi-slice (DCN) scale-out would extend the mesh with an outer axis; the
model is ~30 M parameters so tensor/pipeline sharding is unnecessary
(SURVEY.md §2f).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config


def make_mesh(n_devices: Optional[int] = None,
              batch_size: Optional[int] = None) -> Mesh:
    """1-D 'data' mesh.  When ``batch_size`` is given, use the largest
    device count that divides it (a global batch must shard evenly over the
    mesh — e.g. batch 1 runs on 1 device even on an 8-device host)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if batch_size is not None:
        n = len(devices)
        while batch_size % n:
            n -= 1
        devices = devices[:n]
    return Mesh(np.asarray(devices), ('data',))


def shard_batch(batch, mesh: Mesh):
    sharding = NamedSharding(mesh, P('data'))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def make_data_parallel_step(cfg: Config, mesh: Mesh, template=None):
    """Jitted train step with batch sharded over 'data', state replicated.

    With ``template`` (a TrainState) the step runs over the fused-vector
    PackedTrainState (trainer.make_packed_train_step) — the production
    single-host path; without it, the tree-state step (used by the
    multichip grad-parity tests, which compare tree leaves)."""
    from ..training import trainer as TR

    base_step = (TR.make_packed_train_step(cfg, template)
                 if template is not None else TR.make_train_step(cfg))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P('data'))

    def step(state, batch, rng):
        if len(mesh.devices) > 1:
            batch = {k: jax.device_put(v, data) for k, v in batch.items()}
            state = jax.device_put(state, repl)
        return base_step(state, batch, rng)

    return step
