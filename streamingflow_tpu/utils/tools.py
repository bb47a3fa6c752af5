"""LSS-legacy helpers + Kalman filter.

Reference: streamingflow/utils/tools.py (gen_dx_bx:176, cumsum_trick:184,
QuickCumsum:195, KalmanFilter:392).  The cumsum trick is the sorted
interval-sum that bev_pool's CUDA kernel replaces; on TPU it doubles as the
exact-fp32 'sorted' backend of ops/lift_splat.py.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def gen_dx_bx(xbound, ybound, zbound):
    """Grid resolution dx, first-cell centre bx, cell count nx
    (reference utils/tools.py:176-182)."""
    dx = np.array([row[2] for row in (xbound, ybound, zbound)], np.float32)
    bx = np.array([row[0] + row[2] / 2.0
                   for row in (xbound, ybound, zbound)], np.float32)
    nx = np.array([round((row[1] - row[0]) / row[2])
                   for row in (xbound, ybound, zbound)], np.int64)
    return dx, bx, nx


def cumsum_trick(x: jnp.ndarray, ranks: jnp.ndarray):
    """Interval sums over sorted ranks via cumulative-sum differencing
    (reference utils/tools.py:184-193 / geometry.py VoxelsSumming:299).

    x: (N, C) features sorted by rank; ranks: (N,) sorted bin ids.
    Returns (sums (N, C) at interval ends, kept (N,) end-of-run mask) —
    static shapes; callers scatter `sums[kept]` equivalently by masking."""
    import jax
    n = ranks.shape[0]
    csum = jnp.cumsum(x, axis=0)
    kept = jnp.concatenate([ranks[1:] != ranks[:-1], jnp.ones((1,), bool)])
    # run index per position, then each run's first position
    seg = jnp.cumsum(jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), kept[:-1].astype(jnp.int32)]))
    first_pos = jax.ops.segment_min(jnp.arange(n), seg, num_segments=n)
    start = first_pos[seg]
    before = jnp.where((start > 0)[:, None],
                       csum[jnp.maximum(start - 1, 0)], 0.0)
    sums = csum - before   # at run-end positions (kept): the run total
    return sums, kept


class KalmanFilter:
    """Constant-velocity linear Kalman filter (reference tools.py:392-438,
    dormant in the shipped config; kept for capability parity)."""

    def __init__(self, state_dim: int = 4, obs_dim: int = 2, dt: float = 0.5):
        self.F = np.eye(state_dim)
        for i in range(obs_dim):
            self.F[i, obs_dim + i] = dt
        self.H = np.zeros((obs_dim, state_dim))
        self.H[:obs_dim, :obs_dim] = np.eye(obs_dim)
        self.Q = np.eye(state_dim) * 0.01
        self.R = np.eye(obs_dim) * 0.1

    def predict(self, x: np.ndarray, P: np.ndarray):
        x = self.F @ x
        P = self.F @ P @ self.F.T + self.Q
        return x, P

    def update(self, x: np.ndarray, P: np.ndarray, z: np.ndarray):
        y = z - self.H @ x
        S = self.H @ P @ self.H.T + self.R
        K = P @ self.H.T @ np.linalg.inv(S)
        x = x + K @ y
        P = (np.eye(len(x)) - K @ self.H) @ P
        return x, P

    def track(self, observations: np.ndarray) -> np.ndarray:
        """observations (T, obs_dim) -> filtered states (T, state_dim)."""
        d = self.F.shape[0]
        x = np.zeros(d)
        x[:observations.shape[1]] = observations[0]
        P = np.eye(d)
        out = [x.copy()]
        for z in observations[1:]:
            x, P = self.predict(x, P)
            x, P = self.update(x, P, z)
            out.append(x.copy())
        return np.stack(out)
