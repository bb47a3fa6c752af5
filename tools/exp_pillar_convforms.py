"""Microbench: pillar conv-ladder lowering — XLA conv vs 9-shifted-tap
matmuls, at the flagship shapes (BT=5 clouds).

docs/PERF.md attributes ~13 ms to the ladder (stage3 400^2 at 7-16 % MXU
utilisation); the tap decomposition replaces XLA's conv lowering with plain
dots.  Chained-readback methodology (docs/PERF.md).

Run on TPU; flip models/pillar_encoder.py::PILLAR_CONV_BACKEND (env
STREAMINGFLOW_PILLAR_CONV) if taps wins, then re-run bench.py.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def conv_xla(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=[(1, 1)] * 2,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=x.dtype)


def conv_taps(x, w, stride):
    n, h, wd, c = x.shape
    k = w.shape[-1]
    oh = (h + 2 - 3) // stride + 1
    ow = (wd + 2 - 3) // stride + 1
    pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for a in range(3):
        for b in range(3):
            sl = jax.lax.slice(
                pad, (0, a, b, 0),
                (n, a + (oh - 1) * stride + 1, b + (ow - 1) * stride + 1, c),
                (1, stride, stride, 1))
            t = sl.reshape(-1, c) @ w[a, b]
            out = t if out is None else out + t
    return out.reshape(n, oh, ow, k)


# flagship ladder shapes: (name, H, Cin, Cout, stride)
LADDER = [
    ('stage3_conv1 400^2 240->64 ', 400, 240, 64, 1),
    ('stage3_conv2 400^2  64->64 ', 400, 64, 64, 1),
    ('stage4_down  400^2  64->128 s2', 400, 64, 128, 2),
    ('stage4_conv  200^2 128->128', 200, 128, 128, 1),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=10)
    ap.add_argument('--bt', type=int, default=5)
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)

    tiny = jax.jit(lambda s: s + 1.0)
    zero = jnp.zeros((), jnp.float32)
    float(tiny(zero))
    rtt = min((lambda t0: (float(tiny(zero)), time.perf_counter() - t0))(
        time.perf_counter())[1] for _ in range(3))
    print(f'rtt {rtt*1e3:.1f} ms', flush=True)

    def bench(name, fn, *a):
        @jax.jit
        def run(chain, *a):
            return chain * 0.0 + jnp.sum(fn(*a)[0, 0].astype(jnp.float32))

        float(run(zero, *a))
        t0 = time.perf_counter()
        s = zero
        for _ in range(args.reps):
            s = run(s, *a)
        float(s)
        ms = (time.perf_counter() - t0 - rtt) / args.reps * 1e3
        print(f'{name:34s} {ms:8.2f} ms', flush=True)
        return ms

    tot = {'xla': 0.0, 'taps': 0.0}
    for name, H, cin, cout, stride in LADDER:
        x = jnp.asarray(rng.rand(args.bt, H, H, cin).astype(np.float32),
                        dtype)
        w = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.05,
                        dtype)
        tot['xla'] += bench(f'xla  {name}',
                            lambda x, w, s=stride: conv_xla(x, w, s), x, w)
        tot['taps'] += bench(f'taps {name}',
                             lambda x, w, s=stride: conv_taps(x, w, s), x, w)

    print(f"ladder total: xla {tot['xla']:.2f} ms   taps {tot['taps']:.2f} ms")

    # parity (fp32, stride 1 and 2)
    for stride in (1, 2):
        x = jnp.asarray(rng.rand(2, 32, 32, 6).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 6, 4).astype(np.float32))
        a = conv_xla(x, w, stride)
        b = conv_taps(x, w, stride)
        print(f'stride {stride} max abs diff:',
              float(jnp.max(jnp.abs(a - b))))


if __name__ == '__main__':
    main()
