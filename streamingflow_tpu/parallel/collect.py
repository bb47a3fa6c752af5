"""Distributed metric/result collection.

TPU-native equivalent of the reference's two gather mechanisms:
- Lightning metric states with ``dist_reduce_fx='sum'``
  (streamingflow/metrics.py:32-35, 89-92) -> `psum_metric_states` (an XLA
  psum over the mesh) or `sum_across_processes` (host-level).
- rank-0 eval-result gather via tmpdir pickle / all_gather
  (mmdet3d/models/beverse/tools/multi_gpu_test.py:212-287) ->
  `gather_across_processes`.

The metric classes in training/metrics.py expose `state()` / `load_state()`
numpy arrays precisely so they can ride these reductions.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def psum_metric_states(states, mesh, axis: str = 'data'):
    """Sum per-device metric state arrays over a mesh axis.

    ``states``: pytree of arrays laid out identically on every device.
    Returns the pytree of global sums (replicated)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def reduce_fn(tree):
        return jax.tree.map(lambda x: jax.lax.psum(x, axis), tree)

    spec = jax.tree.map(lambda _: P(axis), states)
    out_spec = jax.tree.map(lambda _: P(), states)
    fn = jax.jit(jax.shard_map(reduce_fn, mesh=mesh, in_specs=(spec,),
                               out_specs=out_spec))
    return fn(states)


def sum_across_processes(state: np.ndarray) -> np.ndarray:
    """Sum a host-side metric state over all JAX processes.

    Single-process: identity.  Multi-process: ride a tiny device psum."""
    if jax.process_count() == 1:
        return np.asarray(state)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(
        jnp.asarray(state))).sum(axis=0)


def gather_across_processes(local: np.ndarray) -> np.ndarray:
    """Stack per-process result arrays (rank-gather of eval outputs).

    Returns (n_processes, *local.shape)."""
    if jax.process_count() == 1:
        return np.asarray(local)[None]
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(jnp.asarray(local)))


def combine_metrics(metrics: Sequence) -> None:
    """Fold many same-type metric objects into the first (host-side).

    Mirrors summing Lightning metric states across workers."""
    first = metrics[0]
    total = first.state()
    for m in metrics[1:]:
        total = total + m.state()
    first.load_state(total)
    return first
