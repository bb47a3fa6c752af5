"""Microbench: TPU row-gather cost vs row width.

Decides the spconv column-engine formulation (ops/sparse_columns.py).
The gather-GEMM engine measured ~17 ns per gathered ROW at narrow widths
(C=16..128 floats), which made 27-tap site gathers the bottleneck
(docs/PERF.md).  The column engine gathers 9 neighbour COLUMNS per conv,
each a fused (nz*C)-wide row (0.6-1.3 KB): if wide-row gathers are
bandwidth-bound rather than row-bound, 9 gathers of ~50 k fat rows cost
~0.7 ms, not ~7 ms, and the column design wins outright.

Run on the real chip:  python tools/exp_gather_width.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _chain_time(fn, args, reps=20):
    """Dependency-chained timing with one readback (docs/PERF.md method)."""
    @jax.jit
    def step(chain, *a):
        out = fn(*a)
        return chain * 0.0 + jnp.sum(out.astype(jnp.float32))

    zero = jnp.zeros((), jnp.float32)
    float(step(zero, *args))  # compile
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(zero))
    rtt = min(min(_t(lambda: float(tiny(zero))) for _ in range(3)), 0.1)
    t0 = time.perf_counter()
    s = zero
    for _ in range(reps):
        s = step(s, *args)
    float(s)
    return (time.perf_counter() - t0 - rtt) / reps


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main():
    print(f'device: {jax.devices()[0]}')
    rng = np.random.default_rng(0)
    n_rows = 49152          # flagship stage-1 column count scale
    n_idx = 49152
    print(f'{"width":>7} {"dtype":>9} {"ms/gather":>10} {"ns/row":>8} '
          f'{"GB/s":>7}')
    for width in (16, 64, 128, 256, 656, 672, 704, 1312):
        for dtype in (jnp.bfloat16, jnp.float32):
            src = jnp.asarray(
                rng.normal(size=(n_rows, width)).astype(np.float32)).astype(
                dtype)
            idx = jnp.asarray(
                rng.integers(0, n_rows, size=(n_idx,)).astype(np.int32))
            dt = _chain_time(lambda s, i: s[i], (src, idx))
            nbytes = n_idx * width * np.dtype(dtype).itemsize
            print(f'{width:>7} {np.dtype(dtype).name:>9} '
                  f'{dt * 1e3:>10.3f} {dt / n_idx * 1e9:>8.1f} '
                  f'{nbytes / dt / 1e9:>7.1f}')

    # 9 taps fused into one big gather (column-engine per-conv pattern)
    width = 656
    src = jnp.asarray(rng.normal(size=(n_rows, width)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    idx9 = jnp.asarray(rng.integers(0, n_rows, size=(9, n_idx))
                       .astype(np.int32))
    dt = _chain_time(lambda s, i: s[i], (src, idx9))
    nbytes = 9 * n_idx * width * 2
    print(f'9-tap fused gather (9x{n_idx} rows, w={width}, bf16): '
          f'{dt * 1e3:.3f} ms, {dt / (9 * n_idx) * 1e9:.1f} ns/row, '
          f'{nbytes / dt / 1e9:.1f} GB/s')

    # scatter (to_columns analogue): one scatter of n_idx rows
    upd = jnp.asarray(rng.normal(size=(n_idx, width)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    uniq = jnp.asarray(rng.permutation(n_rows)[:n_idx].astype(np.int32))
    dt = _chain_time(
        lambda u, i: jnp.zeros((n_rows, width), jnp.bfloat16).at[i].set(u),
        (upd, uniq))
    print(f'scatter-set ({n_idx} rows, w={width}, bf16): {dt * 1e3:.3f} ms')

    # source-size sweep at fixed gathered volume: does gather bandwidth
    # cliff when the source exceeds VMEM (~128 MB on v5e)?
    width = 672
    total_rows = 6 * 86016     # the stage-2 subm tap-gather volume
    print(f'\nsource-size sweep (gather {total_rows} rows of w={width} '
          f'bf16 = {total_rows * width * 2 / 1e9:.2f} GB moved):')
    for src_rows in (8192, 16384, 32768, 49152, 65536, 86016, 131072):
        src = jnp.asarray(rng.normal(size=(src_rows, width))
                          .astype(np.float32)).astype(jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, src_rows, size=(6, 86016))
                          .astype(np.int32))
        dt = _chain_time(lambda s, i: s[i], (src, idx))
        nbytes = total_rows * width * 2
        print(f'  src {src_rows:>7} rows ({src_rows * width * 2 / 1e6:6.1f} '
              f'MB): {dt * 1e3:8.3f} ms  {nbytes / dt / 1e9:6.1f} GB/s')

    # nearly-sorted indices (the engine's real distribution: neighbour
    # slots lie within a few hundred of self) vs uniform random
    src = jnp.asarray(rng.normal(size=(86016, width)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    base = np.arange(86016, dtype=np.int32)
    near = np.stack([np.clip(base + rng.integers(-300, 301, 86016), 0,
                             86015) for _ in range(6)]).astype(np.int32)
    dt = _chain_time(lambda s, i: s[i], (src, jnp.asarray(near)))
    print(f'  nearly-sorted idx (+-300): {dt * 1e3:8.3f} ms  '
          f'{total_rows * width * 2 / dt / 1e9:6.1f} GB/s')


if __name__ == '__main__':
    main()
