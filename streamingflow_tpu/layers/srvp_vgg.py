"""VGG64-style SRVP encoder/decoder variants.

Reference: streamingflow/layers/srvp_models.py (VGG64Encoder:59,
VGG64Decoder:138) — dormant in the shipped config (the main path uses the
Small* pair from layers/srvp.py), rebuilt for capability parity.  64x64
inputs, 4 double-conv stages with 2x maxpool between, mirrored decoder with
optional skip connections.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .conv import resize_nearest


class VGGBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=False)(x)
        x = nn.BatchNorm(momentum=0.9, use_running_average=not train)(x)
        return nn.leaky_relu(x, 0.2)


class VGG64Encoder(nn.Module):
    """64^2 -> 4^2 latent (nh channels); returns skips for the decoder."""
    nh: int
    nf: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False, return_skip: bool = False):
        widths = [self.nf, self.nf * 2, self.nf * 4, self.nf * 8]
        skips = []
        h = x
        for i, w in enumerate(widths):
            if i > 0:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = VGGBlock(w)(h, train=train)
            h = VGGBlock(w)(h, train=train)
            skips.append(h)
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = nn.Conv(self.nh, (4, 4), padding='VALID', use_bias=False)(h)
        h = nn.tanh(h)
        if return_skip:
            return h, skips[::-1]
        return h


class VGG64Decoder(nn.Module):
    """Latent -> 64^2 frame, mirroring VGG64Encoder."""
    nc: int           # output channels
    nf: int = 64
    skip: bool = False

    @nn.compact
    def __call__(self, z, skip: Optional[Sequence] = None,
                 train: bool = False, sigmoid: bool = True):
        assert (skip is None) == (not self.skip)
        widths = [self.nf * 8, self.nf * 4, self.nf * 2, self.nf]
        # latent (B, 1, 1, nh) or (B, h0, w0, nh) -> 4x4 seed
        h = nn.ConvTranspose(widths[0], (4, 4), padding='VALID',
                             use_bias=False)(z)
        h = nn.BatchNorm(momentum=0.9, use_running_average=not train)(h)
        h = nn.leaky_relu(h, 0.2)
        for i, w in enumerate(widths):
            h = resize_nearest(h, (h.shape[1] * 2, h.shape[2] * 2))
            if skip is not None:
                h = jnp.concatenate([h, skip[i]], axis=-1)
            h = VGGBlock(w)(h, train=train)
            h = VGGBlock(w)(h, train=train)
        h = nn.Conv(self.nc, (3, 3), padding=[(1, 1)] * 2)(h)
        if sigmoid:
            h = nn.sigmoid(h)
        return h
