"""Validate + time the double-buffered binning kernel on the real TPU.

Compares the Pallas kernel against the XLA segment-sum reference at the
flagship pillar shape (5 clouds x 80k pts, 2.56M bins) and times it with
the chained-readback scheme (docs/PERF.md methodology).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from streamingflow_tpu.ops.pallas_bin import bin_sum

REPS = 20


def chain_time(fn, args, label, rtt):
    """Dispatch a scalar-chained jit REPS times; one readback at the end
    (docs/PERF.md methodology — avoids XLA CSE of identical in-jit reps)."""
    jfn = jax.jit(fn)
    jchain = jax.jit(lambda s, *a: s * 0.0 + jnp.sum(
        jfn(*a).astype(jnp.float32)))
    zero = jnp.float32(0.0)
    float(jchain(zero, *args))          # compile + warm
    t0 = time.perf_counter()
    s = zero
    for _ in range(REPS):
        s = jchain(s, *args)
    float(s)
    dt = time.perf_counter() - t0
    print(f'{label}: {(dt - rtt) / REPS * 1e3:.2f} ms/call')


def measure_rtt():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))
    t0 = time.perf_counter()
    float(f(x))
    return time.perf_counter() - t0


def main():
    rng = np.random.default_rng(0)
    P = 5 * 80_000
    C = 9
    n_bins = 1600 * 1600
    # LiDAR-like: cluster ids so tiles have realistic occupancy
    ids = np.sort(rng.integers(0, n_bins, P).astype(np.int32))
    data = rng.normal(size=(P, C)).astype(np.float32)
    jd, ji = jnp.asarray(data), jnp.asarray(ids)

    got = bin_sum(jd, ji, n_bins, presorted=True, transposed_out=True)
    ref = jax.ops.segment_sum(jd, jnp.clip(ji, 0, n_bins - 1),
                              num_segments=n_bins).T
    g, r = np.asarray(got, np.float32), np.asarray(ref, np.float32)
    err = np.abs(g - r).max()
    print(f'max abs err vs segment_sum: {err:.3e}')
    assert err < 1e-3, err

    rtt = measure_rtt()
    print(f'rtt {rtt * 1e3:.1f} ms')
    chain_time(lambda d, i: bin_sum(d, i, n_bins, presorted=True,
                                    transposed_out=True), (jd, ji),
               'bin_sum fp32-exact (flagship 400k rows, 2.56M bins)', rtt)
    chain_time(lambda d, i: bin_sum(d, i, n_bins, presorted=True, exact=False,
                                    out_dtype=jnp.bfloat16,
                                    transposed_out=True),
               (jd.astype(jnp.bfloat16), ji),
               'bin_sum bf16 single-pass', rtt)


if __name__ == '__main__':
    main()
