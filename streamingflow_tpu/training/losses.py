"""Training losses (channels-last JAX ports of reference streamingflow/losses.py).

All functions are pure and jit-friendly: top-k uses a fixed k derived from
static shapes; ignore-index masking is arithmetic.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _discounts(seq_len: int, n_present: int, future_discount: float,
               dtype=jnp.float32) -> jnp.ndarray:
    """[1]*n_present ++ [gamma^1 ... gamma^future] (reference losses.py:33-37)."""
    future_len = seq_len - n_present
    future = future_discount ** jnp.arange(1, future_len + 1, dtype=dtype)
    return jnp.concatenate([jnp.ones((n_present,), dtype), future])


def segmentation_loss(prediction: jnp.ndarray, target: jnp.ndarray,
                      class_weights: Sequence[float], n_present: int = 3,
                      ignore_index: int = 255, use_top_k: bool = False,
                      top_k_ratio: float = 1.0,
                      future_discount: float = 1.0) -> jnp.ndarray:
    """Weighted CE with top-k hard-pixel mining and future discount.

    prediction: (B, S, H, W, C) logits; target: (B, S, H, W, 1) int labels.
    Reference: losses.py:43-83."""
    b, s, h, w, c = prediction.shape
    tgt = target[..., 0]
    valid = tgt != ignore_index
    tgt_safe = jnp.where(valid, tgt, 0)
    logp = jax.nn.log_softmax(prediction, axis=-1)
    w_arr = jnp.asarray(class_weights, logp.dtype)
    nll = -jnp.take_along_axis(logp, tgt_safe[..., None], axis=-1)[..., 0]
    loss = nll * w_arr[tgt_safe] * valid

    disc = _discounts(s, n_present, future_discount, loss.dtype)
    loss = loss * disc[None, :, None, None]

    flat = loss.reshape(b, s, h * w)
    if use_top_k:
        k = int(top_k_ratio * h * w)
        flat = jax.lax.top_k(flat, k)[0]  # k hardest pixels per (b, s)
    return jnp.mean(flat)


def spatial_regression_loss(prediction: jnp.ndarray, target: jnp.ndarray,
                            norm: int, n_present: int = 3,
                            ignore_index: int = 255,
                            future_discount: float = 1.0) -> jnp.ndarray:
    """L1/L2 regression, channel-summed, ignore-masked, discounted mean.

    prediction/target: (B, S, H, W, C).  Reference: losses.py:6-40."""
    mask = target[..., :1] != ignore_index  # (B, S, H, W, 1)
    if norm == 1:
        err = jnp.abs(prediction - target)
    elif norm == 2:
        err = (prediction - target) ** 2
    else:
        raise ValueError(f'norm must be 1 or 2, got {norm}')
    loss = jnp.sum(err, axis=-1, keepdims=True)
    s = loss.shape[1]
    disc = _discounts(s, n_present, future_discount, loss.dtype)
    loss = loss * disc[None, :, None, None, None]
    denom = jnp.maximum(jnp.sum(mask), 1)
    total = jnp.sum(loss * mask) / denom
    # all-masked batches contribute zero (reference returns 0, losses.py:24-25)
    return jnp.where(jnp.sum(mask) == 0, 0.0, total)


def hdmap_loss(prediction: jnp.ndarray, target: jnp.ndarray,
               class_weights, training_weights, use_top_k, top_k_ratio,
               ignore_index: int = 255) -> jnp.ndarray:
    """Per-element weighted CE over the present-frame HD map.

    prediction: (B, H, W, 2*n_elements) logits; target: (B, n_elements, H, W).
    Reference: losses.py:85-114."""
    total = 0.0
    b, h, w, _ = prediction.shape
    for i in range(target.shape[1]):
        tgt = target[:, i]
        valid = tgt != ignore_index
        tgt_safe = jnp.where(valid, tgt, 0)
        logits = prediction[..., 2 * i:2 * (i + 1)]
        logp = jax.nn.log_softmax(logits, axis=-1)
        w_arr = jnp.asarray(class_weights[i], logp.dtype)
        nll = -jnp.take_along_axis(logp, tgt_safe[..., None], axis=-1)[..., 0]
        loss = (nll * w_arr[tgt_safe] * valid).reshape(b, h * w)
        if use_top_k[i]:
            k = int(top_k_ratio[i] * h * w)
            loss = jax.lax.top_k(loss, k)[0]
        total = total + jnp.mean(loss) * training_weights[i]
    return total


def depth_loss(prediction: jnp.ndarray, target: jnp.ndarray,
               ignore_index: int = 255) -> jnp.ndarray:
    """CE over depth bins. prediction: (B, S, N, H, W, D) logits;
    target: (B, S, N, H, W) int bins.  Reference: losses.py:116-134."""
    valid = target != ignore_index
    tgt_safe = jnp.where(valid, target, 0)
    logp = jax.nn.log_softmax(prediction, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt_safe[..., None], axis=-1)[..., 0]
    return jnp.mean(nll * valid)


def probabilistic_loss(present_mu, present_log_sigma, future_mu,
                       future_log_sigma) -> jnp.ndarray:
    """Gaussian KL(present || future)-style divergence (reference losses.py:142-151)."""
    var_future = jnp.exp(2 * future_log_sigma)
    var_present = jnp.exp(2 * present_log_sigma)
    kl = (present_log_sigma - future_log_sigma - 0.5
          + (var_future + (future_mu - present_mu) ** 2) / (2 * var_present))
    return jnp.mean(jnp.sum(kl, axis=-1))
