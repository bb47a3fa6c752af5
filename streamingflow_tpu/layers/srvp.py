"""SRVP-style small encoder/decoder and latent-parameter ConvNet.

Reference: streamingflow/layers/res_models.py (ResBlock:52, SmallEncoder:82,
SmallDecoder:112, SELayer:150, ConvNet:168).  Channels-last layouts.

NOTE: res_models.ConvBlock (:8-49) defaults to LeakyReLU(0.1) — unlike the
convolutions.py ConvBlock twin (ReLU).  Every ConvBlock in this module must
therefore pass activation='lrelu' explicitly (pinned at 1e-5 by
tests/test_reference_parity.py::test_ode_single_step_matches_reference_tightly).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .conv import ConvBlock, resize_nearest


class ResBlock(nn.Module):
    """Two ConvBlocks (lrelu default) + dropout, residual with 1x1 projection.

    Reference: layers/res_models.py:52-79."""
    out_channels: Optional[int] = None
    norm: str = 'bn'
    activation: str = 'lrelu'

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        out_channels = self.out_channels or in_channels
        h = ConvBlock(in_channels, 3, norm=self.norm,
                      activation=self.activation)(x, train=train)
        h = ConvBlock(out_channels, 3, norm=self.norm,
                      activation=self.activation)(h, train=train)
        h = nn.Dropout(0.25, deterministic=not train)(h)
        if out_channels != in_channels:
            x = nn.Conv(out_channels, (1, 1))(x)
        return x + h


class SmallEncoder(nn.Module):
    """200^2 -> 50^2 encoder: 5 ResBlocks with maxpool before blocks 1 and 2,
    final tanh ConvBlock.  Reference: layers/res_models.py:82-109."""
    nh: int   # output channels
    nf: int   # base filter count

    @nn.compact
    def __call__(self, x, train: bool = False, return_skip: bool = False):
        widths = [self.nf, self.nf * 2, self.nf * 2, self.nf * 2, self.nf * 4]
        skips = []
        h = x
        for i, w in enumerate(widths):
            if i in (1, 2):
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = ResBlock(w)(h, train=train)
            skips.append(h)
        h = ConvBlock(self.nh, 3, activation='tanh')(h, train=train)
        if return_skip:
            return h, skips[::-1]
        return h


class SmallDecoder(nn.Module):
    """50^2 -> 200^2 decoder mirroring SmallEncoder.

    Reference: layers/res_models.py:112-147."""
    nh: int   # output channels
    nf: int
    skip: bool = False

    @nn.compact
    def __call__(self, z, skip=None, train: bool = False, sigmoid: bool = False):
        assert (skip is None) == (not self.skip)
        h = ConvBlock(self.nf * 4, transpose=True,
                      activation='lrelu')(z, train=train)
        widths = [self.nf * 2, self.nf * 2, self.nf * 2, self.nf, self.nf]
        for i, w in enumerate(widths):
            if skip is not None:
                h = jnp.concatenate([h, skip[i]], axis=-1)
            h = ResBlock(w)(h, train=train)
            if i in (2, 3):
                h = resize_nearest(h, (h.shape[1] * 2, h.shape[2] * 2))
        h = ConvBlock(self.nf, 3, activation='lrelu')(h, train=train)
        h = ConvBlock(self.nh, 3, transpose=True, bias=True, norm='none',
                      activation='lrelu')(h, train=train)
        if sigmoid:
            h = nn.sigmoid(h)
        return h


class SELayer(nn.Module):
    """Squeeze-and-excitation. Reference: layers/res_models.py:150-165."""
    reduction: int = 8

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))  # (B, C)
        y = nn.Dense(c // self.reduction, use_bias=False)(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False)(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class ConvNet(nn.Module):
    """Latent-parameter head (p_model): ResBlock/SE x2 + ConvBlock.

    Reference: layers/res_models.py:168-180."""
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ResBlock(self.out_channels)(x, train=train)
        h = SELayer()(h)
        h = ResBlock(self.out_channels)(h, train=train)
        h = SELayer()(h)
        h = ConvBlock(self.out_channels, 3, bias=True, norm='none',
                      activation='lrelu')(h, train=train)
        return h
