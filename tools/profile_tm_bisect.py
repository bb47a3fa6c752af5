"""Bisect the TemporalModel composition cost.

tools/profile_temporal.py shows the full TemporalModel at 17.5 ms while its
parts (2 TemporalBlocks + DeepLabHead) sum to ~4.5 ms in isolation — the
cost appears only in composition.  This tool builds the model up
incrementally under a single jit to find the step where the time appears.
Chained-readback methodology (docs/PERF.md).
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

from streamingflow_tpu.layers.conv import DeepLabHead
from streamingflow_tpu.layers.temporal import TemporalBlock


class Partial(nn.Module):
    n_blocks: int = 2
    with_head: bool = True
    pyramid: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[2:4]
        for _ in range(self.n_blocks):
            pool_sizes = [(2, h, w)] if self.pyramid else None
            x = TemporalBlock(64, use_pyramid_pooling=self.pyramid,
                              pool_sizes=pool_sizes)(x, train=train)
        if self.with_head:
            b, t = x.shape[:2]
            flat = x.reshape(b * t, *x.shape[2:])
            flat = DeepLabHead(64, hidden_channel=128,
                               name='final_conv')(flat, train=train)
            x = flat.reshape(b, t, *flat.shape[1:])
        return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=20)
    args = ap.parse_args()

    dtype = jnp.bfloat16
    B, T, H, W, C = 1, 3, 200, 200, 70
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, T, H, W, C).astype(np.float32), dtype)
    key = jax.random.PRNGKey(0)

    tiny = jax.jit(lambda s: s + 1.0)
    zero = jnp.zeros((), jnp.float32)
    float(tiny(zero))
    rtt = min((lambda t0: (float(tiny(zero)), time.perf_counter() - t0))(
        time.perf_counter())[1] for _ in range(5))
    print(f'rtt {rtt*1e3:.1f} ms', flush=True)

    def bench(name, module, inp):
        variables = jax.jit(module.init)(key, inp)
        variables = jax.tree.map(
            lambda v: v.astype(jnp.bfloat16)
            if hasattr(v, 'dtype') and v.dtype == jnp.float32 else v,
            variables)

        @jax.jit
        def run(chain, a):
            out = module.apply(variables, a)
            return chain * 0.0 + jnp.sum(out[0, 0, 0].astype(jnp.float32))

        float(run(zero, inp))
        t0 = time.perf_counter()
        s = zero
        for _ in range(args.reps):
            s = run(s, inp)
        float(s)
        ms = (time.perf_counter() - t0 - rtt) / args.reps * 1e3
        print(f'{name:44s} {ms:8.2f} ms', flush=True)

    bench('1 block, no head', Partial(1, False), x)
    bench('2 blocks, no head', Partial(2, False), x)
    bench('2 blocks, no head, no pyramid', Partial(2, False, False), x)
    bench('0 blocks + head', Partial(0, True), x)
    bench('1 block + head', Partial(1, True), x)
    bench('2 blocks + head (== TemporalModel)', Partial(2, True), x)
    bench('2 blocks + head, no pyramid', Partial(2, True, False), x)


if __name__ == '__main__':
    main()
