"""BEV multi-head decoder (ResNet18-style trunk + skip upsampling).

Reference: streamingflow/models/decoder.py (Decoder:8, forward:91-140).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..layers.conv import UpsamplingAdd


class BasicBlock(nn.Module):
    """torchvision resnet18 BasicBlock with zero-init residual BN."""
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        h = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1)] * 2, use_bias=False)(x)
        h = nn.BatchNorm(momentum=0.9, use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=False)(h)
        # zero_init_residual=True (reference decoder.py:22)
        h = nn.BatchNorm(momentum=0.9, use_running_average=not train,
                         scale_init=nn.initializers.zeros)(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False)(x)
            identity = nn.BatchNorm(momentum=0.9,
                                    use_running_average=not train)(identity)
        return nn.relu(h + identity)


def _head(x, mid_channels: int, out_channels: int, train: bool,
          name: str, sigmoid: bool = False):
    h = nn.Conv(mid_channels, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                name=f'{name}_conv1')(x)
    h = nn.BatchNorm(momentum=0.9, use_running_average=not train,
                     name=f'{name}_bn')(h)
    h = nn.relu(h)
    h = nn.Conv(out_channels, (1, 1), name=f'{name}_conv2')(h)
    if sigmoid:
        h = nn.sigmoid(h)
    return h


class Decoder(nn.Module):
    n_classes: int
    n_present: int
    n_hdmap: int = 2
    predict_pedestrian: bool = True
    perceive_hdmap: bool = True
    predict_instance: bool = True
    predict_future_flow: bool = True
    planning: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Optional[jnp.ndarray]]:
        """x: (B, S, H, W, C) future states -> head outputs dict."""
        b, s, H, W, c = x.shape
        flat = x.reshape(b * s, H, W, c)
        skip1 = flat

        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, name='first_conv')(flat)
        h = nn.BatchNorm(momentum=0.9, use_running_average=not train)(h)
        h = nn.relu(h)
        h = BasicBlock(64)(h, train=train)
        h = BasicBlock(64)(h, train=train)
        skip2 = h
        h = BasicBlock(128, stride=2)(h, train=train)
        h = BasicBlock(128)(h, train=train)
        skip3 = h
        h = BasicBlock(256, stride=2)(h, train=train)
        h = BasicBlock(256)(h, train=train)

        h = UpsamplingAdd(128, name='up3_skip')(h, skip3, train=train)
        h = UpsamplingAdd(64, name='up2_skip')(h, skip2, train=train)
        h = UpsamplingAdd(c, name='up1_skip')(h, skip1, train=train)

        def unflat(y):
            return y.reshape(b, s, *y.shape[1:])

        out = {
            'segmentation': unflat(
                _head(h, c, self.n_classes, train, 'segmentation_head')),
            'pedestrian': None, 'hdmap': None, 'instance_center': None,
            'instance_offset': None, 'instance_flow': None, 'costvolume': None,
        }
        if self.predict_pedestrian:
            out['pedestrian'] = unflat(
                _head(h, c, self.n_classes, train, 'pedestrian_head'))
        if self.perceive_hdmap:
            # hdmap only from the present frame (reference decoder.py:122)
            present = unflat(h)[:, self.n_present - 1]
            out['hdmap'] = _head(present, c, 2 * self.n_hdmap, train,
                                 'hdmap_head')
        if self.predict_instance:
            out['instance_center'] = unflat(
                _head(h, c, 1, train, 'instance_center_head', sigmoid=True))
            out['instance_offset'] = unflat(
                _head(h, c, 2, train, 'instance_offset_head'))
        if self.predict_future_flow:
            out['instance_flow'] = unflat(
                _head(h, c, 2, train, 'instance_future_head'))
        if self.planning:
            cv = _head(h, c, 1, train, 'costvolume_head')[..., 0]
            out['costvolume'] = cv.reshape(b, s, *cv.shape[1:])
        return out
