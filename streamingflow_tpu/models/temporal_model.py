"""Per-modality temporal fusion over the past frames.

Reference: streamingflow/models/temporal_model.py (TemporalModel:8,
TemporalModelIdentity:72).
"""
from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..layers.conv import DeepLabHead
from ..layers.temporal import Bottleneck3D, TemporalBlock


class TemporalModel(nn.Module):
    receptive_field: int
    input_shape: Tuple[int, int]
    start_out_channels: int = 64
    extra_in_channels: int = 0
    inbetween_layers: int = 0
    use_pyramid_pooling: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, T, H, W, C) -> (B, T, H, W, start_out_channels)."""
        h, w = self.input_shape
        assert x.shape[2:4] == (h, w), (
            f'temporal model input spatial {x.shape[2:4]} != BEV grid '
            f'{(h, w)} — check LIFT.*_BOUND vs SPARSE_ENCODER '
            f'POINT_CLOUD_RANGE/VOXEL_SIZE (both branches must land on the '
            f'same BEV grid)')
        n_temporal_layers = self.receptive_field - 1
        out_channels = self.start_out_channels
        for _ in range(n_temporal_layers):
            pool_sizes = [(2, h, w)] if self.use_pyramid_pooling else None
            x = TemporalBlock(out_channels,
                              use_pyramid_pooling=self.use_pyramid_pooling,
                              pool_sizes=pool_sizes)(x, train=train)
            for _ in range(self.inbetween_layers):
                x = Bottleneck3D(out_channels, kernel_size=(1, 3, 3))(
                    x, train=train)
            out_channels += self.extra_in_channels

        b, t = x.shape[:2]
        flat = x.reshape(b * t, *x.shape[2:])
        flat = DeepLabHead(out_channels, hidden_channel=128,
                           name='final_conv')(flat, train=train)
        return flat.reshape(b, t, *flat.shape[1:])


class TemporalModelIdentity(nn.Module):
    """Pass-through for TIME_RECEPTIVE_FIELD == 1."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x
