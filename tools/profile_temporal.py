"""Layer-level microbench of the temporal-model stack on the attached chip.

The stage profile shows the two TemporalModels cost ~35 ms combined while
their FLOP count is <1 ms at MXU rate — so the cost is lowering/layout, not
math.  This tool times each sub-layer (CausalConv3d, Conv1x1x1, pyramid
pooling, TemporalBlock, full TemporalModel) at the production shape to find
where the time actually goes.  Chained-readback methodology (see
docs/PERF.md).

Usage: python tools/profile_temporal.py [--reps 10]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=10)
    ap.add_argument('--dtype', default='bf16')
    args = ap.parse_args()

    from streamingflow_tpu.layers.temporal import (
        Bottleneck3D, CausalConv3d, Conv1x1x1NormActivated,
        PyramidSpatioTemporalPooling, SpatialGRU, TemporalBlock)
    from streamingflow_tpu.models.temporal_model import TemporalModel

    dtype = jnp.bfloat16 if args.dtype == 'bf16' else jnp.float32
    B, T, H, W, C = 1, 3, 200, 200, 70
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, T, H, W, C).astype(np.float32), dtype)
    key = jax.random.PRNGKey(0)

    tiny = jax.jit(lambda s: s + 1.0)
    zero = jnp.zeros((), jnp.float32)
    float(tiny(zero))
    rtt = min((lambda t0: (float(tiny(zero)), time.perf_counter() - t0))(
        time.perf_counter())[1] for _ in range(3))
    print(f'rtt {rtt*1e3:.1f} ms', flush=True)

    def bench(name, module, inp, **apply_kw):
        variables = jax.jit(module.init)(key, inp, **apply_kw)
        if dtype == jnp.bfloat16:
            variables = jax.tree.map(
                lambda v: v.astype(jnp.bfloat16)
                if hasattr(v, 'dtype') and v.dtype == jnp.float32 else v,
                variables)

        @jax.jit
        def run(chain, a):
            out = module.apply(variables, a, **apply_kw)
            return chain * 0.0 + jnp.sum(out[0, 0, 0].astype(jnp.float32))

        float(run(zero, inp))
        t0 = time.perf_counter()
        s = zero
        for _ in range(args.reps):
            s = run(s, inp)
        float(s)
        ms = (time.perf_counter() - t0 - rtt) / args.reps * 1e3
        print(f'{name:34s} {ms:8.2f} ms', flush=True)

    bench('Conv1x1x1 (70->35)', Conv1x1x1NormActivated(35), x)
    bench('CausalConv3d (2,3,3) 35->35',
          CausalConv3d(35, (2, 3, 3)), x[..., :35])
    bench('CausalConv3d (1,3,3) 35->35',
          CausalConv3d(35, (1, 3, 3)), x[..., :35])
    bench('PyramidPooling (2,200,200)',
          PyramidSpatioTemporalPooling(C // 3, [(2, H, W)]), x)
    bench('TemporalBlock 70->64 (pyramid)',
          TemporalBlock(64, use_pyramid_pooling=True,
                        pool_sizes=[(2, H, W)]), x)
    bench('Bottleneck3D (1,3,3)', Bottleneck3D(C, (1, 3, 3)), x)
    bench('TemporalModel rf=3 (full)',
          TemporalModel(receptive_field=T, input_shape=(H, W),
                        start_out_channels=64), x)
    xs = jnp.asarray(rng.rand(1, 7, H, W, 48).astype(np.float32), dtype)
    bench('SpatialGRU 7 frames c48', SpatialGRU(48, 48), xs)


if __name__ == '__main__':
    main()
