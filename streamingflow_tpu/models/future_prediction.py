"""Future prediction: asynchronous observation merge + GRU-ODE + refinement.

Reference: streamingflow/models/future_prediction_ode.py (FuturePredictionODE:9).
The reference's per-sample Python loop and dict-based time sort (:36-49)
becomes a batched argsort + gather; the GRU-ODE itself handles per-sample
timelines with masks (layers/ode.py).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..layers.conv import ConvNeXtBlock, DeepLabHead
from ..layers.ode import GRUODEBayes
from ..layers.temporal import SpatialGRU


def merge_observations(camera_states, camera_times, lidar_states, lidar_times):
    """Merge two timestamped observation streams, sorted by time per sample.

    states: (B, T, H, W, C) or None; times: (B, T).
    Returns (times (B, T_all), states (B, T_all, H, W, C)).
    Reference: future_prediction_ode.py:36-49 (dict insert + sort)."""
    streams_t, streams_s = [], []
    if camera_states is not None:
        streams_t.append(camera_times)
        streams_s.append(camera_states)
    if lidar_states is not None:
        streams_t.append(lidar_times)
        streams_s.append(lidar_states)
    times = jnp.concatenate(streams_t, axis=1)
    states = jnp.concatenate(streams_s, axis=1)
    order = jnp.argsort(times, axis=1, stable=True)
    times = jnp.take_along_axis(times, order, axis=1)
    states = jnp.take_along_axis(states, order[:, :, None, None, None], axis=1)
    return times, states


class FuturePredictionODE(nn.Module):
    in_channels: int
    latent_dim: int
    delta_t: float = 0.05
    n_gru_blocks: int = 2
    n_res_layers: int = 1
    solver: str = 'euler'
    impute: bool = False
    variable_step: bool = False
    srvp_filter_size: int = 64
    skipco: bool = False
    max_gap_seconds: float = 0.6
    stochastic: bool = True

    @nn.compact
    def __call__(self, future_prediction_input, camera_states, camera_times,
                 lidar_states, lidar_times, target_times, train: bool = False):
        """future_prediction_input: (B, 1, H, W, C) present state.
        Returns refined future states (B, T_target, H, W, C)."""
        obs_times, obs = merge_observations(camera_states, camera_times,
                                            lidar_states, lidar_times)
        x = GRUODEBayes(
            input_size=self.in_channels, hidden_size=self.latent_dim,
            delta_t=self.delta_t, solver=self.solver, impute=self.impute,
            variable_step=self.variable_step,
            srvp_filter_size=self.srvp_filter_size, skipco=self.skipco,
            max_gap_seconds=self.max_gap_seconds, stochastic=self.stochastic,
            name='gru_ode')(obs_times, obs, future_prediction_input,
                            target_times, train=train)

        # 2x [SpatialGRU -> res refinement] (reference :56-63)
        hidden_state = x[:, 0]
        for i in range(self.n_gru_blocks):
            x = SpatialGRU(self.in_channels, self.in_channels,
                           name=f'spatial_gru_{i}')(x, hidden_state)
            b, s = x.shape[:2]
            flat = x.reshape(b * s, *x.shape[2:])
            if i < self.n_gru_blocks - 1:
                for j in range(self.n_res_layers):
                    flat = ConvNeXtBlock(name=f'res_block_{i}_{j}')(
                        flat, train=train)
            else:
                flat = DeepLabHead(self.in_channels, hidden_channel=128,
                                   name=f'res_block_{i}')(flat, train=train)
            x = flat.reshape(b, s, *flat.shape[1:])
        return x
