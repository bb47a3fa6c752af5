"""Flagship-scale LiDAR spconv8x encoder bench on the attached chip.

Whole-encoder wall time per engine ('column' | 'tiled' | 'gather') and,
for the column engine, per z-conv formulation ('banded' | 'conv').
Chained-readback timing (one RTT paid, docs/PERF.md methodology).

    python tools/profile_column.py [column,conv column,banded gather ...]

Defaults to the column engine both ways.  Clouds are the bench's
LiDAR-like synthetic distribution (the tiled/gather numbers in PERF.md
used the same).  NPTS/NSWEEPS env override the flagship 80k x 5.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(apply_fn, pts, reps=int(os.environ.get('REPS', '5'))):
    @jax.jit
    def step(chain, p):
        out = apply_fn(p)
        return chain * 0.0 + jnp.sum(out.astype(jnp.float32))

    zero = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    float(step(zero, pts))
    compile_s = time.perf_counter() - t0
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(zero))
    rtt = min(_t(lambda: float(tiny(zero))) for _ in range(3))
    t0 = time.perf_counter()
    s = zero
    for _ in range(reps):
        s = step(s, pts)
    float(s)
    return (time.perf_counter() - t0 - rtt) / reps, compile_s


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main():
    from streamingflow_tpu.config import Config
    from streamingflow_tpu.data.synthetic import _lidar_like_clouds
    from streamingflow_tpu.models.lidar_encoder import LidarBEVEncoder

    variants = sys.argv[1:] or ['column,conv', 'column,banded']
    P = int(os.environ.get('NPTS', '80000'))
    T = int(os.environ.get('NSWEEPS', '5'))
    dtype = os.environ.get('DTYPE', 'bf16')

    base = Config().MODEL.SPARSE_ENCODER
    rng = np.random.RandomState(0)
    pts = np.asarray(_lidar_like_clouds(rng, (1, T), P,
                                        base.POINT_CLOUD_RANGE),
                     np.float32)
    pts = jnp.asarray(pts)
    print(f'device: {jax.devices()[0]}  clouds: {pts.shape}  dtype: {dtype}')

    for variant in variants:
        parts = variant.split(',')
        cfg = Config().MODEL.SPARSE_ENCODER
        cfg.ENGINE = parts[0]
        if len(parts) > 1:
            cfg.Z_FORMULATION = parts[1]
        if len(parts) > 2:             # column,sep,3 -> DENSE_TAIL stage
            cfg.DENSE_TAIL_FROM_STAGE = int(parts[2])
        if dtype == 'bf16':
            cfg.COMPUTE_DTYPE = 'bfloat16'
        enc = LidarBEVEncoder(cfg)
        try:
            v = jax.jit(enc.init)({'params': jax.random.PRNGKey(0)}, pts)
            if dtype == 'bf16':
                v = jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32 else x, v)
            run_s, compile_s = chain_time(
                lambda p: enc.apply(v, p), pts)
            print(f'{variant:16s} compile {compile_s:7.1f}s   '
                  f'run {run_s * 1e3:9.2f} ms   '
                  f'({T / run_s:.2f} cloud-sets/s)', flush=True)
        except Exception as e:  # noqa: BLE001 — report per-variant failures
            msg = str(e).split(chr(10))[0][:300]
            print(f'{variant:16s} FAILED: {type(e).__name__}: {msg}',
                  flush=True)


if __name__ == '__main__':
    main()
