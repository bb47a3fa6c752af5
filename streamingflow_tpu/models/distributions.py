"""Latent distribution heads (Gaussian / MixGaussian / Bernoulli).

Reference: streamingflow/models/distributions.py (DistributionModule:7) and
streamingflow.py:448-511 (distribution_forward).  Constructed-but-unwired in
the shipped config, kept for capability parity.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers.conv import Bottleneck


class DistributionModule(nn.Module):
    """Encode present features into latent distribution parameters."""
    latent_dim: int
    method: str = 'GAUSSIAN'

    @nn.compact
    def __call__(self, s_t, train: bool = False):
        """s_t: (B, 1, H, W, C) -> (B, 1, out_dim) distribution params."""
        if self.method == 'GAUSSIAN':
            out_dim = 2 * self.latent_dim
        elif self.method == 'MIXGAUSSIAN':
            out_dim = 6 * self.latent_dim + 3
        elif self.method == 'BERNOULLI':
            out_dim = self.latent_dim
        else:
            raise NotImplementedError(self.method)

        b, s = s_t.shape[:2]
        flat = s_t.reshape(b * s, *s_t.shape[2:])
        h = Bottleneck(self.latent_dim)(flat, train=train)
        h = jnp.mean(h, axis=(1, 2), keepdims=True)  # spatial avg pool
        h = nn.Conv(out_dim, (1, 1))(h)
        return h.reshape(b, s, out_dim)


def distribution_forward(params: jnp.ndarray, latent_dim: int, method: str,
                         hw: Tuple[int, int], rng: Optional[jax.Array],
                         min_log_sigma: float = -5.0,
                         max_log_sigma: float = 5.0) -> jnp.ndarray:
    """Sample a spatially-broadcast latent from distribution parameters.

    params: (B, 1, out_dim); returns (B, 1, H, W, latent_dim).
    Reference: streamingflow.py:448-511; rng None => zero noise (eval)."""
    b, s = params.shape[:2]
    h, w = hw

    def mu_sigma_sample(p, key):
        mu = p[..., :latent_dim]
        log_sigma = jnp.clip(p[..., latent_dim:2 * latent_dim],
                             min_log_sigma, max_log_sigma)
        noise = (jax.random.normal(key, mu.shape, mu.dtype)
                 if key is not None else jnp.zeros_like(mu))
        return mu + jnp.exp(log_sigma) * noise

    if method == 'GAUSSIAN':
        sample = mu_sigma_sample(params, rng)
    elif method == 'MIXGAUSSIAN':
        keys = jax.random.split(rng, 3) if rng is not None else [None] * 3
        samples = [mu_sigma_sample(params[..., 2 * i * latent_dim:
                                          2 * (i + 1) * latent_dim], keys[i])
                   for i in range(3)]
        coeff = nn.softmax(params[..., 6 * latent_dim:], axis=-1)
        sample = sum(samples[i] * coeff[..., i:i + 1] for i in range(3))
    elif method == 'BERNOULLI':
        noise = (jax.random.normal(rng, params.shape, params.dtype)
                 if rng is not None else jnp.zeros_like(params))
        sample = jnp.exp(params) + noise
    else:
        raise NotImplementedError(method)

    return jnp.broadcast_to(sample[:, :, None, None, :],
                            (b, s, h, w, latent_dim))
