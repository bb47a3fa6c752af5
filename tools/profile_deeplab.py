"""Microbench: full DeepLabHead at production shape, piece by piece.

Stage profiling attributes ~15 ms of each TemporalModel to the trailing
DeepLabHead; tools/profile_aspp.py showed its dilated convs are only
~0.6-2 ms each in isolation, so this tool measures the real flax module and
its sub-pieces to find the cost.  Chained-readback methodology
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
from flax import linen as nn

from streamingflow_tpu.layers.conv import ASPP, DeepLabHead


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=10)
    args = ap.parse_args()

    dtype = jnp.bfloat16
    N, H, W, C = 3, 200, 200, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(N, H, W, C).astype(np.float32), dtype)

    tiny = jax.jit(lambda s: s + 1.0)
    zero = jnp.zeros((), jnp.float32)
    float(tiny(zero))
    rtt = min((lambda t0: (float(tiny(zero)), time.perf_counter() - t0))(
        time.perf_counter())[1] for _ in range(3))
    print(f'rtt {rtt*1e3:.1f} ms', flush=True)

    def bench(name, mod, x):
        variables = mod.init(jax.random.PRNGKey(0), x, train=False)
        variables = jax.tree.map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
            variables)

        @jax.jit
        def run(chain, x):
            out = mod.apply(variables, x, False)
            return chain * 0.0 + jnp.sum(out[0, 0].astype(jnp.float32))

        float(run(zero, x))
        t0 = time.perf_counter()
        s = zero
        for _ in range(args.reps):
            s = run(s, x)
        float(s)
        ms = (time.perf_counter() - t0 - rtt) / args.reps * 1e3
        print(f'{name:40s} {ms:8.2f} ms', flush=True)

    bench('DeepLabHead(64, hidden=128)', DeepLabHead(64, 128), x)
    bench('ASPP(128)', ASPP(128), x)

    class Pieces(nn.Module):
        which: str

        @nn.compact
        def __call__(self, x, train: bool = False):
            def bn_relu(h):
                h = nn.BatchNorm(momentum=0.9, use_running_average=True)(h)
                return nn.relu(h)
            if self.which == 'branches':
                res = [bn_relu(nn.Conv(128, (1, 1), use_bias=False)(x))]
                for rate in (12, 24, 36):
                    h = nn.Conv(128, (3, 3), kernel_dilation=(rate, rate),
                                padding=[(rate, rate)] * 2, use_bias=False)(x)
                    res.append(bn_relu(h))
                return sum(res)
            if self.which == 'pool':
                pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
                pooled = nn.Conv(128, (1, 1), use_bias=False)(pooled)
                pooled = bn_relu(pooled)
                return jnp.broadcast_to(
                    pooled, (x.shape[0], x.shape[1], x.shape[2], 128))
            if self.which == 'concat_proj':
                res = [x] * 10  # 640 channels
                out = jnp.concatenate(res, axis=-1)
                out = nn.Conv(128, (1, 1), use_bias=False)(out)
                return bn_relu(out)
            if self.which == 'tail':
                h = nn.Conv(128, (3, 3), padding=[(1, 1)] * 2,
                            use_bias=False)(x)
                h = bn_relu(h)
                return nn.Conv(64, (1, 1))(h)
            raise ValueError(self.which)

    for which in ('branches', 'pool', 'concat_proj', 'tail'):
        bench(f'piece: {which}', Pieces(which), x)


if __name__ == '__main__':
    main()
