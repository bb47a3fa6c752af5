"""Small tensor utilities (reference streamingflow/utils/network.py)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pack_sequence_dim(x):
    """(B, T, ...) -> (B*T, ...). Reference network.py:5-7."""
    b, t = x.shape[:2]
    return x.reshape(b * t, *x.shape[2:])


def unpack_sequence_dim(x, b, t):
    """(B*T, ...) -> (B, T, ...). Reference network.py:10-12."""
    return x.reshape(b, t, *x.shape[1:])


def preprocess_batch(batch, dtype=jnp.float32):
    """Host numpy batch -> device arrays (reference network.py:14-24)."""
    out = {}
    for key, value in batch.items():
        if isinstance(value, np.ndarray):
            out[key] = jnp.asarray(value)
        else:
            out[key] = value
    return out
