"""Latent distribution heads (Gaussian / MixGaussian / Bernoulli).

Reference: streamingflow/models/distributions.py (DistributionModule:7,
DistributionEncoder:54) and streamingflow.py:448-511 (distribution_forward).
The reference constructs neither on its shipped path (`present_distribution`
is never assigned there), so this hook is exposed as a model method behind
PROBABILISTIC.ENABLED rather than spliced into the forward pass — see
docs/PARITY.md.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers.conv import Bottleneck


class DistributionEncoder(nn.Module):
    """4x strided Bottleneck compressor (reference distributions.py:54-67)."""
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(4):
            x = Bottleneck(self.out_channels, downsample=True)(x, train=train)
        return x


class DistributionModule(nn.Module):
    """Encode present features into latent distribution parameters.

    GAUSSIAN -> (B, 1, 2*latent); MIXGAUSSIAN -> (B, 1, 6*latent+3);
    BERNOULLI -> spatial per-pixel log-probs (B, 1, H, W, latent).
    Reference distributions.py:7-51."""
    in_channels: int
    latent_dim: int
    method: str = 'GAUSSIAN'

    @nn.compact
    def __call__(self, s_t, train: bool = False):
        """s_t: (B, 1, H, W, C) present state (channels-last)."""
        b, s = s_t.shape[:2]
        x = s_t[:, 0]
        if self.method in ('GAUSSIAN', 'MIXGAUSSIAN'):
            out_dim = 2 * self.latent_dim if self.method == 'GAUSSIAN' \
                else 6 * self.latent_dim + 3
            compress = self.in_channels // 2
            h = DistributionEncoder(compress, name='encoder')(x, train=train)
            h = jnp.mean(h, axis=(1, 2), keepdims=True)   # AdaptiveAvgPool2d(1)
            h = nn.Conv(out_dim, (1, 1), name='decoder')(h)
            return h.reshape(b, s, out_dim)
        if self.method == 'BERNOULLI':
            h = Bottleneck(self.latent_dim, name='encoder')(x, train=train)
            return nn.log_sigmoid(h)[:, None]             # (B, 1, H, W, L)
        raise NotImplementedError(self.method)


def distribution_forward(params: jnp.ndarray, latent_dim: int, method: str,
                         hw: Tuple[int, int], rng: Optional[jax.Array],
                         min_log_sigma: float = -5.0,
                         max_log_sigma: float = 5.0) -> jnp.ndarray:
    """Sample a spatially-broadcast latent from distribution parameters.

    Returns (B, 1, H, W, latent_dim).  rng None => zero noise (the reference
    uses self.training to gate noise, streamingflow.py:465-469).
    Reference: streamingflow.py:448-511."""
    h, w = hw

    def mu_sigma_sample(p, key):
        mu = p[..., :latent_dim]
        log_sigma = jnp.clip(p[..., latent_dim:2 * latent_dim],
                             min_log_sigma, max_log_sigma)
        noise = (jax.random.normal(key, mu.shape, mu.dtype)
                 if key is not None else jnp.zeros_like(mu))
        return mu + jnp.exp(log_sigma) * noise

    if method == 'GAUSSIAN':
        b, s = params.shape[:2]
        sample = mu_sigma_sample(params, rng)
    elif method == 'MIXGAUSSIAN':
        b, s = params.shape[:2]
        keys = jax.random.split(rng, 3) if rng is not None else [None] * 3
        samples = [mu_sigma_sample(params[..., 2 * i * latent_dim:
                                          2 * (i + 1) * latent_dim], keys[i])
                   for i in range(3)]
        coeff = nn.softmax(params[..., 6 * latent_dim:], axis=-1)
        sample = sum(samples[i] * coeff[..., i:i + 1] for i in range(3))
    elif method == 'BERNOULLI':
        # params are spatial log-probs (B, 1, H, W, L); sample keeps space
        noise = (jax.random.normal(rng, params.shape, params.dtype)
                 if rng is not None else jnp.zeros_like(params))
        return jnp.exp(params) + noise
    else:
        raise NotImplementedError(method)

    return jnp.broadcast_to(sample[:, :, None, None, :],
                            (b, s, h, w, latent_dim))
