"""Microbench: dilated-conv ASPP vs shifted-tap matmul formulation.

The temporal-model stage profile attributes ~15 ms of each TemporalModel to
the trailing DeepLabHead; its ASPP uses 3x3 convs with dilation 12/24/36,
which XLA lowers poorly on TPU (the effective 73x73 receptive field defeats
MXU tiling).  A dilated 3x3 conv is exactly 9 shifted 1x1 convs, i.e. one
(HW, 9C) @ (9C, K) matmul over rolled copies — MXU-shaped.  This tool
measures both at the production shape.  Chained-readback methodology
(docs/PERF.md).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def dilated_conv_ref(x, w, rate):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(rate, rate)] * 2,
        rhs_dilation=(rate, rate),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def dilated_conv_taps(x, w, rate):
    """Same conv as 9 shifted 1x1 matmuls, summed."""
    n, h, wd, c = x.shape
    k = w.shape[-1]
    pad = jnp.pad(x, ((0, 0), (rate, rate), (rate, rate), (0, 0)))
    out = jnp.zeros((n, h, wd, k), x.dtype)
    for di in range(3):
        for dj in range(3):
            sl = jax.lax.dynamic_slice(
                pad, (0, di * rate, dj * rate, 0), (n, h, wd, c))
            out = out + (sl.reshape(-1, c) @ w[di, dj]).reshape(n, h, wd, k)
    return out


def dilated_conv_concat(x, w, rate):
    """Same conv as one (HW, 9C) @ (9C, K) matmul over rolled copies."""
    n, h, wd, c = x.shape
    k = w.shape[-1]
    pad = jnp.pad(x, ((0, 0), (rate, rate), (rate, rate), (0, 0)))
    cols = [jax.lax.dynamic_slice(pad, (0, di * rate, dj * rate, 0),
                                  (n, h, wd, c))
            for di in range(3) for dj in range(3)]
    col = jnp.concatenate(cols, axis=-1).reshape(-1, 9 * c)
    return (col @ w.reshape(9 * c, k)).reshape(n, h, wd, k)


def deeplab_head(backend, x):
    """Full DeepLabHead at the production temporal-model shape."""
    from streamingflow_tpu.layers import conv as convmod
    from streamingflow_tpu.layers.conv import DeepLabHead
    old = convmod.DILATED_CONV_BACKEND
    convmod.DILATED_CONV_BACKEND = backend
    try:
        m = DeepLabHead(num_classes=64, hidden_channel=128)
        v = m.init({'params': jax.random.PRNGKey(0)}, x)
    finally:
        convmod.DILATED_CONV_BACKEND = old
    return m, v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=10)
    ap.add_argument('--cpu', action='store_true',
                    help='pin the CPU backend (smoke test; sitecustomize '
                         'ignores the JAX_PLATFORMS env var)')
    args = ap.parse_args()
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    dtype = jnp.bfloat16
    N, H, W, C, K = 3, 200, 200, 64, 128
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(N, H, W, C).astype(np.float32), dtype)
    w = jnp.asarray(rng.rand(3, 3, C, K).astype(np.float32) * 0.01, dtype)

    tiny = jax.jit(lambda s: s + 1.0)
    zero = jnp.zeros((), jnp.float32)
    float(tiny(zero))
    rtt = min((lambda t0: (float(tiny(zero)), time.perf_counter() - t0))(
        time.perf_counter())[1] for _ in range(3))
    print(f'rtt {rtt*1e3:.1f} ms', flush=True)

    def bench(name, fn, *a):
        jfn = jax.jit(fn)

        @jax.jit
        def run(chain, *a):
            return chain * 0.0 + jnp.sum(jfn(*a)[0, 0].astype(jnp.float32))

        float(run(zero, *a))
        t0 = time.perf_counter()
        s = zero
        for _ in range(args.reps):
            s = run(s, *a)
        float(s)
        ms = (time.perf_counter() - t0 - rtt) / args.reps * 1e3
        print(f'{name:40s} {ms:8.2f} ms', flush=True)

    for rate in (1, 12, 24, 36):
        bench(f'conv_general_dilated rate={rate}',
              lambda x, w, r=rate: dilated_conv_ref(x, w, r), x, w)
    for rate in (12, 24, 36):
        bench(f'9-shifted-matmul     rate={rate}',
              lambda x, w, r=rate: dilated_conv_taps(x, w, r), x, w)
    for rate in (12, 24, 36):
        bench(f'im2col-concat        rate={rate}',
              lambda x, w, r=rate: dilated_conv_concat(x, w, r), x, w)

    # full module A/B on the xla-init'd params (param trees are identical)
    mx, vx = deeplab_head('xla', x)
    mt, _ = deeplab_head('taps', x)
    bench('DeepLabHead xla ', lambda xx: mx.apply(vx, xx), x)
    bench('DeepLabHead taps', lambda xx: mt.apply(vx, xx), x)

    # parity
    a = dilated_conv_ref(x.astype(jnp.float32), w.astype(jnp.float32), 12)
    b = dilated_conv_taps(x.astype(jnp.float32), w.astype(jnp.float32), 12)
    c = dilated_conv_concat(x.astype(jnp.float32), w.astype(jnp.float32), 12)
    print('max abs diff taps   (fp32):', float(jnp.max(jnp.abs(a - b))))
    print('max abs diff concat (fp32):', float(jnp.max(jnp.abs(a - c))))


if __name__ == '__main__':
    main()
