"""Camera encoder: truncated EfficientNet + DeepLab feature/depth necks.

Reference: streamingflow/models/encoder.py (Encoder:10, get_features_depth:64).
Outputs 64-ch features and D-bin depth logits at 1/8 resolution.
"""
from __future__ import annotations

from flax import linen as nn

from ..layers.conv import DeepLabHead, UpsamplingConcat
from .efficientnet import EfficientNetBackbone


class Encoder(nn.Module):
    out_channels: int           # cfg.MODEL.ENCODER.OUT_CHANNELS (C)
    depth_channels: int         # D (48 for D_BOUND [2, 50, 1))
    backbone_name: str = 'efficientnet-b4'
    downsample: int = 8
    use_depth_distribution: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B', H, W, 3) images. Returns (feature, depth_logits):
        (B', H/8, W/8, C) and (B', H/8, W/8, D) (depth None if disabled)."""
        input_1, input_2 = EfficientNetBackbone(
            self.backbone_name, self.downsample, name='backbone')(x, train=train)

        c1 = input_1.shape[-1]
        feature = DeepLabHead(c1, hidden_channel=64,
                              name='feature_layer_1')(input_1, train=train)
        feature = UpsamplingConcat(self.out_channels,
                                   name='feature_layer_2')(feature, input_2,
                                                           train=train)
        if self.use_depth_distribution:
            depth = DeepLabHead(c1, hidden_channel=64,
                                name='depth_layer_1')(input_1, train=train)
            depth = UpsamplingConcat(self.depth_channels,
                                     name='depth_layer_2')(depth, input_2,
                                                           train=train)
        else:
            depth = None
        return feature, depth
