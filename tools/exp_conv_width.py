"""Experiment: MXU utilisation of the pillar stage-3 convs vs channel width.

Previous finding: XLA convs at Cin=Cout=128 hit ~90% MXU util; 64-channel
operands only 10-18%.  Measures the shipped ladder (240->64, 64->64 @400^2)
against a widened 128-channel stage 3 (more FLOPs, better util) and a
720-deep variant, all x5 frames bf16.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REPS = 10


def main():
    key = jax.random.PRNGKey(0)
    zero = jnp.zeros((), jnp.float32)
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(zero))
    rtt = min((lambda t0: (float(tiny(zero)), time.perf_counter() - t0))(
        time.perf_counter())[1] for _ in range(3))
    print(f'rtt {rtt*1e3:.1f} ms', flush=True)

    def timed(name, fn, *a, flops=0):
        jfn = jax.jit(fn)
        chain = jax.jit(lambda s, *aa: s * 0.0 + jnp.sum(
            jfn(*aa).astype(jnp.float32)))
        jax.block_until_ready(jfn(*a))
        float(chain(zero, *a))
        t0 = time.perf_counter()
        s = zero
        for _ in range(REPS):
            s = chain(s, *a)
        float(s)
        run = (time.perf_counter() - t0 - rtt) / REPS
        util = flops / run / 197e12 * 100 if flops else 0
        print(f'{name:40s} {run*1e3:8.2f} ms  {util:5.1f}% MXU', flush=True)

    def conv(cin, cout, hw, stride=1, n=5):
        x = jax.random.normal(key, (n, hw, hw, cin), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16) * 0.01
        fl = 2 * n * (hw // stride) ** 2 * cin * cout * 9
        timed(f'conv {cin}->{cout} @{hw}^2 s{stride} x{n}',
              lambda x, w: jax.lax.conv_general_dilated(
                  x, w, (stride, stride), 'SAME',
                  dimension_numbers=('NHWC', 'HWIO', 'NHWC')),
              x, w, flops=fl)

    # shipped ladder
    conv(240, 64, 400)
    conv(64, 64, 400)
    conv(64, 128, 400, stride=2)
    conv(128, 128, 200)
    # widened stage 3
    conv(240, 128, 400)
    conv(128, 128, 400)
    conv(128, 128, 400, stride=2)
    # 256-wide for reference
    conv(256, 256, 400)
    # does fusing BT into one big batch change anything? (n=1 vs n=5)
    conv(240, 128, 400, n=1)
    # 1x1 projection cost at 400^2 (for a possible 128->64 tail)
    x = jax.random.normal(key, (5, 400, 400, 128), jnp.bfloat16)
    w = jax.random.normal(key, (1, 1, 128, 64), jnp.bfloat16) * 0.01
    timed('conv1x1 128->64 @400^2 x5',
          lambda x, w: jax.lax.conv_general_dilated(
              x, w, (1, 1), 'SAME',
              dimension_numbers=('NHWC', 'HWIO', 'NHWC')),
          x, w, flops=2 * 5 * 400 * 400 * 128 * 64)


if __name__ == '__main__':
    main()
