"""Sub-stage profile of the pillar LiDAR encoder (bf16, flagship shapes).

Breaks the ~32 ms 'lidar: voxelize+sparse conv' stage into: the Pallas
binning pillarizer, the space-to-depth fold, and each dense conv stage.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from streamingflow_tpu.config import Config
from streamingflow_tpu.models.pillar_encoder import (ConvBNReLU,
                                                     PillarBEVEncoder,
                                                     pillarize)
from flax import linen as nn

REPS = 10


def main():
    from bench import full_cfg
    cfg = full_cfg()
    scfg = cfg.MODEL.SPARSE_ENCODER
    key = jax.random.PRNGKey(0)
    zero = jnp.zeros((), jnp.float32)
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(zero))
    rtt = min((lambda t0: (float(tiny(zero)), time.perf_counter() - t0))(
        time.perf_counter())[1] for _ in range(3))
    print(f'rtt {rtt*1e3:.1f} ms', flush=True)

    from streamingflow_tpu.data import make_batch
    batch = make_batch(cfg, batch_size=1, n_points=80000)
    points = jnp.asarray(batch['points']).astype(jnp.bfloat16)  # (1,5,P,5)
    B, T, P, C = points.shape
    flat = points.reshape(B * T, P, C)
    pmask = jnp.any(flat[..., :3] != 0, axis=-1)

    def bf16(tree):
        return jax.tree.map(
            lambda v: v.astype(jnp.bfloat16)
            if hasattr(v, 'dtype') and v.dtype == jnp.float32 else v, tree)

    def timed(name, fn, *a, init_module=None):
        if init_module is not None:
            variables = bf16(jax.jit(init_module.init)(
                {'params': key}, *a))
            raw = fn
            fn = lambda *aa: raw(variables, *aa)
        jfn = jax.jit(fn)
        chain = jax.jit(lambda s, *aa: s * 0.0 + jax.tree.reduce(
            lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), jfn(*aa),
            0.0))
        jax.block_until_ready(jfn(*a))
        float(chain(zero, *a))
        t0 = time.perf_counter()
        s = zero
        for _ in range(REPS):
            s = chain(s, *a)
        float(s)
        run = (time.perf_counter() - t0 - rtt) / REPS
        print(f'{name:34s} {run*1e3:8.2f} ms', flush=True)

    tile_sorted = cfg.MODEL.LIDAR.TILE_SORTED_POINTS

    def pil(flat, pmask):
        return jnp.stack([
            pillarize(flat[i], pmask[i], scfg.POINT_CLOUD_RANGE,
                      scfg.VOXEL_SIZE, 8, out_dtype=jnp.bfloat16,
                      presorted=tile_sorted)
            for i in range(B * T)])

    timed('pillarize x5 (binning kernel)', pil, flat, pmask)
    h = jax.jit(pil)(flat, pmask)
    print('pillar grid', h.shape, h.dtype, flush=True)

    def s2d(h):
        bt, nx, ny, f = h.shape
        s = 4
        h = h.reshape(bt, nx // s, s, ny // s, s, f)
        return jnp.moveaxis(h, (2, 4), (3, 4)).reshape(
            bt, nx // s, ny // s, s * s * f)

    timed('space-to-depth 4x', s2d, h)
    h2 = jax.jit(s2d)(h)
    print('s2d grid', h2.shape, flush=True)

    c3 = scfg.ENCODER_CHANNELS[-2][-1]
    c4 = scfg.ENCODER_CHANNELS[-1][-1]
    m1 = ConvBNReLU(c3)
    timed('stage3_conv1 (240->64 @400^2 x5)',
          lambda v, x: m1.apply(v, x), h2, init_module=m1)
    h3 = jnp.ones((B * T, h2.shape[1], h2.shape[2], c3), jnp.bfloat16)
    m2 = ConvBNReLU(c3)
    timed('stage3_conv2 (64->64 @400^2 x5)',
          lambda v, x: m2.apply(v, x), h3, init_module=m2)
    m3 = ConvBNReLU(c4, stride=2)
    timed('stage4_down (64->128 s2 x5)',
          lambda v, x: m3.apply(v, x), h3, init_module=m3)
    h4 = jnp.ones((B * T, h2.shape[1] // 2, h2.shape[2] // 2, c4),
                  jnp.bfloat16)
    m4 = ConvBNReLU(c4)
    timed('stage4_conv (128->128 @200^2 x5)',
          lambda v, x: m4.apply(v, x), h4, init_module=m4)

    enc = PillarBEVEncoder(scfg, tile_sorted=tile_sorted)
    timed('FULL pillar encoder',
          lambda v, p: enc.apply(v, p), points, init_module=enc)


if __name__ == '__main__':
    main()
