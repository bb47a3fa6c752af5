"""Dense NDHWC conv3d at the spconv stage shapes vs the column engine.

If a late stage's grid is small enough, a dense conv (no gathers, no
maps, no site generation — just MXU) can beat the column path despite
computing every cell and lane-padding C to 128.

    python tools/exp_dense_stage.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from exp_column_pieces import chain_time

# (grid, nz, C) per stage + the column-engine measured subm ms for context
SHAPES = [
    ((800, 800), 21, 32, 'col sep 20.8ms'),
    ((400, 400), 11, 64, 'col sep 8.3ms'),
    ((200, 200), 5, 128, 'col banded 3.7ms'),
]


def main():
    print(f'device: {jax.devices()[0]}')
    rng = np.random.default_rng(0)
    for grid, nz, c, note in SHAPES:
        x = jnp.asarray(rng.standard_normal((1, grid[0], grid[1], nz, c)),
                        jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, c, c)) * 0.1,
                        jnp.bfloat16)

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), 'SAME',
                dimension_numbers=('NHWDC', 'HWDIO', 'NHWDC'),
                preferred_element_type=jnp.bfloat16)

        dt = chain_time(conv, (x, w),
                        label=f'{grid[0]}^2x{nz}x{c} dense conv3d ({note})')
        flops = 2 * grid[0] * grid[1] * nz * 27 * c * c
        print(f'    -> {flops / dt / 1e12:.1f} TFLOP/s effective')

        # fused-z 2D conv: x (1, nx, ny, nz*C), weights (3, 3, nz*C, nz*C)
        # block-banded (3 dz taps per z-output block; dense here — zeros
        # don't change matmul cost).  No lane padding at 672-704 fused
        # lanes; pays nz/3 x FLOPs vs exact 3-D.
        xf = x.reshape(1, grid[0], grid[1], nz * c)
        wf = jnp.asarray(rng.standard_normal((3, 3, nz * c, nz * c)) * 0.1,
                         jnp.bfloat16)

        def conv2d_fused(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.bfloat16)

        dt2 = chain_time(conv2d_fused, (xf, wf),
                         label=f'{grid[0]}^2 fused-z 2D conv ({nz}z x {c}ch '
                               f'= {nz * c} lanes)')
        fl2 = 2 * grid[0] * grid[1] * 9 * (nz * c) ** 2
        print(f'    -> {fl2 / dt2 / 1e12:.1f} TFLOP/s effective '
              f'({fl2 / flops:.1f}x exact-3D FLOPs)')

        # exact-FLOP z decomposition: conv3d = sum over dz of a (3,3,1)
        # conv on the dz-shifted input.  Kernel z-extent 1 should ride
        # XLA's 2D conv path (x/y spatial, z a free batch-like dim); pays
        # 2 pad/slice shifts (full-tensor copies) + 2 adds.
        def conv_zshift(x, w):
            w5 = w  # (3, 3, 3, c, c) HWDIO
            out = None
            for dz in range(3):
                xs = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
                xs = xs[:, :, :, dz:dz + nz, :]
                y = jax.lax.conv_general_dilated(
                    xs, w5[:, :, dz:dz + 1], (1, 1, 1),
                    [(1, 1), (1, 1), (0, 0)],
                    dimension_numbers=('NHWDC', 'HWDIO', 'NHWDC'),
                    preferred_element_type=jnp.bfloat16)
                out = y if out is None else out + y
            return out

        dt3 = chain_time(conv_zshift, (x, w),
                         label=f'{grid[0]}^2x{nz}x{c} zshift 3x(3,3,1) conv')
        print(f'    -> {flops / dt3 / 1e12:.1f} TFLOP/s effective (exact FLOPs)')

        # same idea, one conv: concat the 3 z-shifts on channels -> one
        # (3,3,1) conv at 3C input channels (better MXU K dim; pays a 3x
        # input materialisation)
        def conv_zcat(x, w):
            xs = [jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
                  [:, :, :, dz:dz + nz, :] for dz in range(3)]
            xc = jnp.concatenate(xs, axis=-1)
            wc = jnp.concatenate([w[:, :, dz] for dz in range(3)], axis=2)
            return jax.lax.conv_general_dilated(
                xc, wc[:, :, None], (1, 1, 1), [(1, 1), (1, 1), (0, 0)],
                dimension_numbers=('NHWDC', 'HWDIO', 'NHWDC'),
                preferred_element_type=jnp.bfloat16)

        dt4 = chain_time(conv_zcat, (x, w),
                         label=f'{grid[0]}^2x{nz}x{c} zcat (3,3,1)@3C conv')
        print(f'    -> {flops / dt4 / 1e12:.1f} TFLOP/s effective (exact FLOPs)')

        # strided downsample conv at the same shape
        wd = jnp.asarray(rng.standard_normal((3, 3, 3, c, 2 * c)) * 0.1,
                         jnp.bfloat16)

        def down(x, wd):
            return jax.lax.conv_general_dilated(
                x, wd, (2, 2, 2), [(1, 1), (1, 1), (1, 1)],
                dimension_numbers=('NHWDC', 'HWDIO', 'NHWDC'),
                preferred_element_type=jnp.bfloat16)

        chain_time(down, (x, wd),
                   label=f'{grid[0]}^2x{nz}x{c} dense down s2')

        # elementwise epilogue pass (BN+relu analogue) on the padded layout
        scale = jnp.ones((c,), jnp.bfloat16)
        chain_time(lambda x, s: jax.nn.relu(x * s + 0.1), (x, scale),
                   label=f'{grid[0]}^2x{nz}x{c} elementwise pass')


if __name__ == '__main__':
    main()
