"""EfficientNet backbone (B0/B4/B7) in flax, channels-last.

Reimplements the public EfficientNet architecture used by the reference
camera encoder (streamingflow/models/encoder.py:19 via efficientnet_pytorch)
including the downsample-8 truncation rule (encoder.py:44-62: keep blocks
idx <= 10/21/37 for b0/b4/b7) and the multi-scale ``reduction_i`` endpoints
(encoder.py:64-105).  BatchNorm uses TF hyper-params (momentum 0.99,
eps 1e-3); convs use TF 'SAME' padding; activation is swish/silu.
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# (num_repeat, kernel, stride, expand_ratio, input_filters, output_filters, se_ratio)
_BASE_BLOCK_ARGS = [
    (1, 3, 1, 1, 32, 16, 0.25),
    (2, 3, 2, 6, 16, 24, 0.25),
    (2, 5, 2, 6, 24, 40, 0.25),
    (3, 3, 2, 6, 40, 80, 0.25),
    (3, 5, 1, 6, 80, 112, 0.25),
    (4, 5, 2, 6, 112, 192, 0.25),
    (1, 3, 1, 6, 192, 320, 0.25),
]

# width_coefficient, depth_coefficient, dropout_rate
_PARAMS = {
    'efficientnet-b0': (1.0, 1.0, 0.2),
    'efficientnet-b4': (1.4, 1.8, 0.4),
    'efficientnet-b7': (2.0, 3.1, 0.5),
}

# truncation index for DOWNSAMPLE == 8 (reference encoder.py:44-53)
_TRUNCATE_IDX_DS8 = {'b0': 10, 'b4': 21, 'b7': 37}

_DROP_CONNECT_RATE = 0.2


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new_filters = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_filters < 0.9 * filters:
        new_filters += divisor
    return int(new_filters)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def _bn(train: bool):
    return nn.BatchNorm(momentum=0.99, epsilon=1e-3,
                        use_running_average=not train)


class MBConvBlock(nn.Module):
    """Mobile inverted bottleneck with squeeze-excitation."""
    in_filters: int
    out_filters: int
    kernel: int
    stride: int
    expand_ratio: int
    se_ratio: float
    drop_connect_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        inputs = x
        expanded = self.in_filters * self.expand_ratio
        if self.expand_ratio != 1:
            x = nn.Conv(expanded, (1, 1), use_bias=False, name='expand_conv')(x)
            x = _bn(train)(x)
            x = nn.silu(x)
        x = nn.Conv(expanded, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding='SAME',
                    feature_group_count=expanded, use_bias=False,
                    name='depthwise_conv')(x)
        x = _bn(train)(x)
        x = nn.silu(x)

        if self.se_ratio > 0:
            se_channels = max(1, int(self.in_filters * self.se_ratio))
            s = jnp.mean(x, axis=(1, 2), keepdims=True)
            s = nn.Conv(se_channels, (1, 1), name='se_reduce')(s)
            s = nn.silu(s)
            s = nn.Conv(expanded, (1, 1), name='se_expand')(s)
            x = nn.sigmoid(s) * x

        x = nn.Conv(self.out_filters, (1, 1), use_bias=False,
                    name='project_conv')(x)
        x = _bn(train)(x)

        if self.stride == 1 and self.in_filters == self.out_filters:
            if train and self.drop_connect_rate > 0:
                keep = 1.0 - self.drop_connect_rate
                rng = self.make_rng('dropout')
                mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
                x = x / keep * mask
            x = x + inputs
        return x


class EfficientNetBackbone(nn.Module):
    """Truncated EfficientNet feature extractor returning reduction endpoints.

    Returns (input_1, input_2): the deepest endpoint and the one a factor-2
    shallower, exactly the pair consumed by the reference encoder neck at
    DOWNSAMPLE == 8 (encoder.py:103-105)."""
    name_version: str = 'efficientnet-b4'
    downsample: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        width, depth, _ = _PARAMS[self.name_version]
        version = self.name_version.split('-')[1]
        assert self.downsample == 8, 'only the shipped downsample=8 is built'
        truncate_idx = _TRUNCATE_IDX_DS8[version]

        # expand per-block list
        blocks: List[Tuple[int, int, int, int, int, int, float]] = []
        for (r, k, s, e, ci, co, se) in _BASE_BLOCK_ARGS:
            ci_r = round_filters(ci, width)
            co_r = round_filters(co, width)
            reps = round_repeats(r, depth)
            for i in range(reps):
                blocks.append((k, s if i == 0 else 1, e,
                               ci_r if i == 0 else co_r, co_r, se))
        n_blocks = truncate_idx + 1  # blocks kept after deletion

        # stem
        stem_filters = round_filters(32, width)
        x = nn.Conv(stem_filters, (3, 3), strides=(2, 2), padding='SAME',
                    use_bias=False, name='conv_stem')(x)
        x = _bn(train)(x)
        x = nn.silu(x)

        endpoints = {}
        prev = x
        for idx, (k, s, e, ci, co, se) in enumerate(blocks[:n_blocks]):
            rate = _DROP_CONNECT_RATE * idx / n_blocks
            x = MBConvBlock(ci, co, k, s, e, se, rate,
                            name=f'block_{idx}')(x, train=train)
            if prev.shape[1] > x.shape[1]:
                endpoints[f'reduction_{len(endpoints) + 1}'] = prev
            prev = x
        endpoints[f'reduction_{len(endpoints) + 1}'] = x

        index = int(math.log2(self.downsample))
        return endpoints[f'reduction_{index + 1}'], endpoints[f'reduction_{index}']


def reduction_channels(name_version: str) -> Sequence[int]:
    """Channel counts of reduction endpoints (reference encoder.py:22-27)."""
    return {
        'efficientnet-b4': [0, 24, 32, 56, 160, 448],
        'efficientnet-b0': [0, 16, 24, 40, 112, 320],
        'efficientnet-b7': [0, 32, 48, 80, 224, 640],
    }[name_version]
