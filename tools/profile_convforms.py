"""Compare lowering strategies for the refinement-stack convs on TPU.

The ASPP dilated 3x3 convs and the ConvNeXt depthwise 7x7 dominate the
refinement block at low MXU utilization.  This tool times, at the flagship
shape (7, 200, 200, C) bf16:

* plain XLA 3x3 conv 64->128
* XLA dilated 3x3 (rates 12/24/36) 64->128
* the same dilated conv as 9 shifted pad/slice + dot_general matmuls
* XLA depthwise 7x7 (feature_group_count=C)
* depthwise 7x7 as 49 shifted scale-adds
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, CIN, COUT = 7, 200, 200, 64, 128
REPS = 20


def shifted2(x, dy, dx):
    """out[y, x] = in[y+dy, x+dx], zero padded."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (abs(dy), abs(dy)), (abs(dx), abs(dx)), (0, 0)))
    return xp[:, abs(dy) + dy:abs(dy) + dy + h,
              abs(dx) + dx:abs(dx) + dx + w, :]


def conv_shifted_matmul(x, w, rate):
    """3x3 dilation-``rate`` conv as 9 shifted matmuls. w: (3, 3, CIN, COUT)."""
    out = None
    for i in range(3):
        for j in range(3):
            dy, dx = (i - 1) * rate, (j - 1) * rate
            xs = shifted2(x, dy, dx)
            t = jnp.einsum('bhwc,cf->bhwf', xs, w[i, j])
            out = t if out is None else out + t
    return out


def dw_shifted(x, w):
    """depthwise 7x7 as 49 shifted scale-adds. w: (7, 7, C)."""
    out = None
    for i in range(7):
        for j in range(7):
            t = shifted2(x, i - 3, j - 3) * w[i, j]
            out = t if out is None else out + t
    return out


def main():
    key = jax.random.PRNGKey(0)
    zero = jnp.zeros((), jnp.float32)
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(zero))
    rtt = min((lambda t0: (float(tiny(zero)), time.perf_counter() - t0))(
        time.perf_counter())[1] for _ in range(3))
    print(f'rtt {rtt*1e3:.1f} ms', flush=True)

    x = jax.random.normal(key, (B, H, W, CIN), jnp.bfloat16)
    w3 = jax.random.normal(key, (3, 3, CIN, COUT), jnp.bfloat16) * 0.05
    wdw = jax.random.normal(key, (7, 7, CIN), jnp.bfloat16) * 0.05

    def timed(name, fn, *a):
        jfn = jax.jit(fn)
        chain = jax.jit(lambda s, *aa: s * 0.0
                        + jnp.sum(jfn(*aa).astype(jnp.float32)))
        jax.block_until_ready(jfn(*a))
        float(chain(zero, *a))
        t0 = time.perf_counter()
        s = zero
        for _ in range(REPS):
            s = chain(s, *a)
        float(s)
        run = (time.perf_counter() - t0 - rtt) / REPS
        print(f'{name:36s} {run*1e3:8.3f} ms', flush=True)

    def xla_conv(x, w, rate):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(rate, rate)] * 2, rhs_dilation=(rate, rate),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    timed('xla 3x3 rate 1', lambda x: xla_conv(x, w3, 1), x)
    for r in (12, 24, 36):
        timed(f'xla 3x3 rate {r}', functools.partial(
            lambda x, r: xla_conv(x, w3, r), r=r), x)
        timed(f'shifted-matmul 3x3 rate {r}', functools.partial(
            lambda x, r: conv_shifted_matmul(x, w3, r), r=r), x)
    timed('xla depthwise 7x7', lambda x: jax.lax.conv_general_dilated(
        x, wdw.reshape(7, 7, 1, CIN), (1, 1), [(3, 3)] * 2,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=CIN), x)
    timed('shifted scale-add dw 7x7', lambda x: dw_shifted(x, wdw), x)


if __name__ == '__main__':
    main()
