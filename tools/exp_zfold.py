"""Dense-conv formulations at spconv stage shapes — A/B on the chip.

The dense tail's cost class is XLA conv utilisation at mid-size 3-D
shapes.  Three exact formulations of the same 3x3x3 conv over a dense
(B, nx, ny, nz, C) grid:

  ndhwc   — lax.conv_general_dilated NHWDC (current dense tail).  Lane
            pads C -> 128 in HBM; XLA's 3-D conv scheduling.
  zfold   — fold z into the batch axis and run kz batched 2-D convs on
            z-shifted slices (exact; the z pad doubles as the slice
            margin).  2-D conv scheduling, same lane pad.
  grouped — pack gz = 128//C z-planes into the channel dim (lane-exact
            128) and run one conv3d over (x, y, z-group) with a
            block-banded (3, 3, kg, 128, 128) kernel built from the 27
            taps.  Burns (kg*gz/kz)x FLOPs to buy full-lane matmuls.

    python tools/exp_zfold.py [--clouds 5]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from exp_column_pieces import chain_time

# (grid, nz, C, 'context': column-engine measured subm ms/conv/cloud)
SHAPES = [
    ((800, 800), 21, 32, 'col sep 20.8ms'),
    ((400, 400), 11, 64, 'col sep 8.3ms'),
    ((200, 200), 5, 128, 'col banded 3.7ms'),
]


def ndhwc(x, w3):
    return jax.lax.conv_general_dilated(
        x, w3, (1, 1, 1), 'SAME',
        dimension_numbers=('NHWDC', 'HWDIO', 'NHWDC'),
        preferred_element_type=x.dtype)


def zfold(x, w3):
    """kz batched 2-D convs over z-shifted slices of the z-padded fold."""
    B, nx, ny, nz, c = x.shape
    kz = w3.shape[2]
    pz = kz // 2
    xp = jnp.pad(x, ((0, 0),) * 3 + ((pz, pz), (0, 0)))
    out = None
    for tz in range(kz):
        sl = xp[:, :, :, tz:tz + nz]                     # (B, nx, ny, nz, C)
        f = jnp.transpose(sl, (0, 3, 1, 2, 4)).reshape(B * nz, nx, ny, c)
        y = jax.lax.conv_general_dilated(
            f, w3[:, :, tz], (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=x.dtype)
        out = y if out is None else out + y
    return out.reshape(B, nz, nx, ny, c).transpose(0, 2, 3, 1, 4)


def grouped_weight(w3, c, gz, kg, fg, dtype):
    """(3,3,kz,C,C) taps -> (3,3,kg,gz*C,gz*C) block-banded kernel."""
    kz = w3.shape[2]
    W = np.zeros((3, 3, kg, gz * c, gz * c), np.float32)
    wnp = np.asarray(w3, np.float32)
    for r in range(gz):                  # output z lane-group offset
        for tz in range(kz):
            off = r + tz - (kz // 2) + fg * gz
            kgr, lane = off // gz, off % gz
            W[:, :, kgr, lane * c:(lane + 1) * c, r * c:(r + 1) * c] = \
                wnp[:, :, tz]
    return jnp.asarray(W, dtype)


def grouped(x, wg, gz, fg, ng):
    B, nx, ny, nz, c = x.shape
    kg = wg.shape[2]
    pad_z = ng * gz - nz
    xg = jnp.pad(x, ((0, 0),) * 3 + ((0, pad_z), (0, 0))).reshape(
        B, nx, ny, ng, gz * c)
    y = jax.lax.conv_general_dilated(
        xg, wg, (1, 1, 1),
        [(1, 1), (1, 1), (fg, kg - 1 - fg)],
        dimension_numbers=('NHWDC', 'HWDIO', 'NHWDC'),
        preferred_element_type=x.dtype)
    return y.reshape(B, nx, ny, ng * gz, c)[:, :, :, :nz]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--clouds', type=int, default=5)
    args = ap.parse_args()
    print(f'device: {jax.devices()[0]}  clouds: {args.clouds}')
    rng = np.random.default_rng(0)
    for grid, nz, c, note in SHAPES:
        B = args.clouds
        x = jnp.asarray(rng.standard_normal((B, grid[0], grid[1], nz, c)),
                        jnp.bfloat16)
        w3 = jnp.asarray(rng.standard_normal((3, 3, 3, c, c)) * 0.1,
                         jnp.bfloat16)
        flops = 2 * B * grid[0] * grid[1] * nz * 27 * c * c
        print(f'--- {grid[0]}^2 x {nz}z x {c}ch  ({note}; '
              f'{flops / 1e12:.2f} TFLOP exact)')

        for name, fn in (('ndhwc', lambda xx: ndhwc(xx, w3)),
                         ('zfold', lambda xx: zfold(xx, w3))):
            try:
                dt = chain_time(fn, (x,), label=f'  {name}')
                print(f'      -> {flops / dt / 1e12:.1f} TF/s eff '
                      f'({flops / dt / 1.97e14 * 100:.0f}% of peak)')
            except Exception as e:  # noqa: BLE001
                print(f'  {name} FAILED: {str(e)[:160]}')

        gz = max(1, 128 // c)
        kg = ((gz - 1) + 3 - 1 - 1 + gz) // gz + 1   # off in [-1, gz+1]
        fg = 1
        ng = -(-nz // gz)
        wg = grouped_weight(w3, c, gz, kg, fg, jnp.bfloat16)
        gflops = (2 * B * grid[0] * grid[1] * ng * 9 * kg
                  * (gz * c) * (gz * c))
        try:
            dt = chain_time(lambda xx: grouped(xx, wg, gz, fg, ng), (x,),
                            label=f'  grouped gz={gz} kg={kg}')
            print(f'      -> {gflops / dt / 1e12:.1f} TF/s raw '
                  f'({gflops / dt / 1.97e14 * 100:.0f}% of peak; '
                  f'{gflops / flops:.1f}x exact FLOPs)')
        except Exception as e:  # noqa: BLE001
            print(f'  grouped FAILED: {str(e)[:160]}')

        # numeric agreement (tiny shapes once per config class is enough,
        # but cheap here at fp32 on a slice)
        xs = x[:1, :32, :32].astype(jnp.float32)
        w3f = w3.astype(jnp.float32)
        a = ndhwc(xs, w3f)
        bz = zfold(xs, w3f)
        gg = grouped(xs, grouped_weight(w3f, c, gz, kg, fg, jnp.float32),
                     gz, fg, ng)
        da = float(jnp.max(jnp.abs(a - bz)))
        dg = float(jnp.max(jnp.abs(a - gg)))
        print(f'  parity: |ndhwc-zfold| {da:.2e}  |ndhwc-grouped| {dg:.2e}')


if __name__ == '__main__':
    main()
