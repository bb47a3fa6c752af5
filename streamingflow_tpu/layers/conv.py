"""2-D convolutional building blocks (flax.linen, channels-last).

TPU-native re-implementations of reference streamingflow/layers/convolutions.py.
All feature maps are (B, H, W, C).  BatchNorm follows torch semantics:
eps 1e-5, running-average momentum `1 - BN_MOMENTUM` in flax convention.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


# Default torch-parity batch norm settings.  Flax momentum = 1 - torch momentum.
def make_norm(norm: str, momentum: float = 0.9, epsilon: float = 1e-5,
              dtype=None):
    if norm == 'bn':
        return nn.BatchNorm(momentum=momentum, epsilon=epsilon, dtype=dtype)
    if norm == 'in':
        # InstanceNorm: GroupNorm with one group per channel.
        return nn.GroupNorm(group_size=1, epsilon=epsilon, dtype=dtype)
    if norm == 'none':
        return None
    raise ValueError(f'Invalid norm {norm}')


def make_activation(activation: str):
    return {
        'relu': nn.relu,
        'lrelu': partial(nn.leaky_relu, negative_slope=0.1),
        'elu': nn.elu,
        'tanh': jnp.tanh,
        'gelu': nn.gelu,
        'none': None,
    }[activation]


def resize_bilinear(x: jnp.ndarray, out_hw, align_corners: bool = False
                    ) -> jnp.ndarray:
    """Bilinear resize matching torch interpolate(align_corners=False)."""
    assert not align_corners
    B = x.shape[0]
    new_shape = (B, out_hw[0], out_hw[1], x.shape[-1])
    return jax.image.resize(x, new_shape, method='bilinear')


def resize_nearest(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    B = x.shape[0]
    return jax.image.resize(x, (B, out_hw[0], out_hw[1], x.shape[-1]),
                            method='nearest')


class ConvBlock(nn.Module):
    """Conv -> optional norm -> optional activation.

    Reference: layers/convolutions.py:10-62 (and the lrelu-default twin at
    layers/res_models.py:8-49)."""
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    norm: str = 'bn'
    activation: str = 'relu'
    bias: bool = False
    transpose: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        if self.transpose:
            # reference uses ConvTranspose2d with stride=1 here; with stride 1 a
            # transposed conv with symmetric padding equals a standard conv.
            x = nn.ConvTranspose(self.out_channels, (k, k),
                                 strides=(self.stride, self.stride),
                                 padding=[(k // 2, k // 2)] * 2,
                                 use_bias=self.bias)(x)
        else:
            x = nn.Conv(self.out_channels, (k, k),
                        strides=(self.stride, self.stride),
                        padding=[(k // 2, k // 2)] * 2,
                        use_bias=self.bias)(x)
        norm = make_norm(self.norm)
        if norm is not None:
            x = norm(x, use_running_average=not train) if self.norm == 'bn' else norm(x)
        act = make_activation(self.activation)
        if act is not None:
            x = act(x)
        return x


class Bottleneck(nn.Module):
    """1x1 down-project -> kxk conv (optionally strided / transposed) -> 1x1
    up-project, with residual.  Reference: layers/convolutions.py:65-169."""
    out_channels: Optional[int] = None
    kernel_size: int = 3
    upsample: bool = False
    downsample: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        out_channels = self.out_channels or in_channels
        bottleneck = in_channels // 2
        k = self.kernel_size
        pad = k // 2

        def bn_relu(h):
            h = nn.BatchNorm(momentum=0.9, use_running_average=not train)(h)
            return nn.relu(h)

        h = nn.Conv(bottleneck, (1, 1), use_bias=False)(x)
        h = bn_relu(h)
        if self.upsample:
            # torch ConvTranspose2d(k, stride=2, padding=p, output_padding=p)
            # maps to flax/lax explicit padding (k-1-p, k-1): doubles H, W.
            h = nn.ConvTranspose(bottleneck, (k, k), strides=(2, 2),
                                 padding=[(k - 1 - pad, k - 1)] * 2,
                                 use_bias=False)(h)
        elif self.downsample:
            h = nn.Conv(bottleneck, (k, k), strides=(2, 2),
                        padding=[(pad, pad)] * 2, use_bias=False)(h)
        else:
            h = nn.Conv(bottleneck, (k, k), padding=[(pad, pad)] * 2,
                        use_bias=False)(h)
        h = bn_relu(h)
        h = nn.Conv(out_channels, (1, 1), use_bias=False)(h)
        h = bn_relu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)

        if out_channels == in_channels and not self.downsample and not self.upsample:
            return h + x
        skip = x
        if self.upsample:
            skip = resize_bilinear(skip, (x.shape[1] * 2, x.shape[2] * 2))
        elif self.downsample:
            skip = nn.max_pool(skip, (2, 2), strides=(2, 2))
        skip = nn.Conv(out_channels, (1, 1), use_bias=False)(skip)
        skip = nn.BatchNorm(momentum=0.9, use_running_average=not train)(skip)
        return h + skip


class UpsamplingConcat(nn.Module):
    """Bilinear x2 upsample, concat skip, two conv-bn-relu.

    Reference: layers/convolutions.py:183-201."""
    out_channels: int
    scale_factor: int = 2

    @nn.compact
    def __call__(self, x_to_upsample, x, train: bool = False):
        h, w = x_to_upsample.shape[1:3]
        up = resize_bilinear(x_to_upsample,
                             (h * self.scale_factor, w * self.scale_factor))
        out = jnp.concatenate([x, up], axis=-1)
        for _ in range(2):
            out = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                          use_bias=False)(out)
            out = nn.BatchNorm(momentum=0.9, use_running_average=not train)(out)
            out = nn.relu(out)
        return out


class UpsamplingAdd(nn.Module):
    """Bilinear upsample -> 1x1 conv -> bn, then add skip.

    Reference: layers/convolutions.py:204-215."""
    out_channels: int
    scale_factor: int = 2

    @nn.compact
    def __call__(self, x, x_skip, train: bool = False):
        h, w = x.shape[1:3]
        x = resize_bilinear(x, (h * self.scale_factor, w * self.scale_factor))
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False)(x)
        x = nn.BatchNorm(momentum=0.9, use_running_average=not train)(x)
        return x + x_skip


# Backend for the large-rate dilated convs in ASPP:
#   'xla'  — lax.conv_general_dilated (XLA's native lowering)
#   'taps' — 9 statically shifted (H*W, Cin) @ (Cin, Cout) matmuls
# XLA lowers rate-12/24/36 dilated 3x3 convs poorly on TPU (the 73x73
# effective window defeats MXU tiling; measured 2-19 % MXU utilisation),
# while the tap decomposition is pure matmul.  Overridable per-process for
# benchmarking (tools/profile_aspp.py decides the default).
DILATED_CONV_BACKEND = os.environ.get('STREAMINGFLOW_DILATED_BACKEND', 'xla')


class DilatedConv3x3(nn.Module):
    """3x3 dilated/strided conv computed as 9 shifted 1x1 matmuls, summed.

    Mathematically identical to nn.Conv(kernel_dilation=(rate, rate),
    strides=(stride, stride), padding=rate, use_bias=False) — only the
    accumulation order differs.  The param tree matches nn.Conv
    ('kernel', (3, 3, Cin, Cout)) so the checkpoint-conversion rules
    (tools/rules_prediction_lc_ode_variable.py) are unaffected when a
    caller swaps backends."""
    features: int
    rate: int = 1
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, c, self.features), jnp.float32)
        dt = jnp.promote_types(x.dtype, kernel.dtype)
        x = x.astype(dt)
        kernel = kernel.astype(dt)
        r, s = self.rate, self.stride
        oh = (h + 2 * r - (2 * r + 1)) // s + 1
        ow = (w + 2 * r - (2 * r + 1)) // s + 1
        pad = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)))
        out = None
        for di in range(3):
            for dj in range(3):
                sl = jax.lax.slice(
                    pad, (0, di * r, dj * r, 0),
                    (n, di * r + (oh - 1) * s + 1, dj * r + (ow - 1) * s + 1,
                     c), (1, s, s, 1))
                t = sl.reshape(-1, c) @ kernel[di, dj]
                out = t if out is None else out + t
        return out.reshape(n, oh, ow, self.features)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling. Reference: layers/convolutions.py:242-270.

    Convs are explicitly named Conv_0..Conv_5 so the flax param paths are
    stable across dilated-conv backends (see DILATED_CONV_BACKEND)."""
    out_channels: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn_relu(h):
            h = nn.BatchNorm(momentum=0.9, use_running_average=not train)(h)
            return nn.relu(h)

        res = []
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    name='Conv_0')(x)
        res.append(bn_relu(h))
        for i, rate in enumerate(self.atrous_rates):
            if DILATED_CONV_BACKEND == 'taps':
                h = DilatedConv3x3(self.out_channels, rate,
                                   name=f'Conv_{i + 1}')(x)
            else:
                h = nn.Conv(self.out_channels, (3, 3),
                            kernel_dilation=(rate, rate),
                            padding=[(rate, rate)] * 2, use_bias=False,
                            name=f'Conv_{i + 1}')(x)
            res.append(bn_relu(h))
        # image-level pooling branch
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                         name='Conv_4')(pooled)
        pooled = bn_relu(pooled)
        pooled = jnp.broadcast_to(
            pooled, (x.shape[0], x.shape[1], x.shape[2], self.out_channels))
        res.append(pooled)

        out = jnp.concatenate(res, axis=-1)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                      name='Conv_5')(out)
        out = bn_relu(out)
        out = nn.Dropout(0.5, deterministic=not train)(out)
        return out


class DeepLabHead(nn.Module):
    """ASPP -> 3x3 conv-bn-relu -> 1x1 conv. Reference: layers/convolutions.py:272-280."""
    num_classes: int
    hidden_channel: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ASPP(self.hidden_channel)(x, train=train)
        x = nn.Conv(self.hidden_channel, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=False)(x)
        x = nn.BatchNorm(momentum=0.9, use_running_average=not train)(x)
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1))(x)


class LayerNorm2d(nn.Module):
    """LayerNorm over the channel axis of (B, H, W, C). eps matches ConvNeXt."""
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon)(x)


class ConvNeXtBlock(nn.Module):
    """ConvNeXt block: dwconv7x7 -> LN -> linear x4 -> GELU -> linear, layer
    scale + residual.  Reference: layers/convolutions.py:310-346."""
    layer_scale_init_value: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim = x.shape[-1]
        h = nn.Conv(dim, (7, 7), padding=[(3, 3)] * 2, feature_group_count=dim)(x)
        h = nn.LayerNorm(epsilon=1e-6)(h)
        h = nn.Dense(4 * dim)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(dim)(h)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                'gamma',
                lambda key, shape: jnp.full(shape, self.layer_scale_init_value),
                (dim,))
            h = gamma * h
        return x + h


class Bottleblock(nn.Module):
    """7x7 -> LN -> GELU -> 1x1 -> LN -> GELU -> 3x3 -> LN -> GELU with
    residual. Reference: layers/convolutions.py:348-380."""
    out_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        out_channels = self.out_channels or in_channels
        bottleneck = in_channels // 2

        def ln_gelu(h):
            h = nn.LayerNorm(epsilon=1e-6)(h)
            return nn.gelu(h, approximate=False)

        h = nn.Conv(bottleneck, (7, 7), padding=[(3, 3)] * 2, use_bias=False)(x)
        h = ln_gelu(h)
        h = nn.Conv(bottleneck, (1, 1), use_bias=False)(h)
        h = ln_gelu(h)
        h = nn.Conv(out_channels, (3, 3), padding=[(1, 1)] * 2, use_bias=False)(h)
        h = ln_gelu(h)

        if out_channels == in_channels:
            return h + x
        skip = nn.Conv(out_channels, (1, 1), use_bias=False)(x)
        skip = nn.gelu(skip, approximate=False)
        return h + skip
