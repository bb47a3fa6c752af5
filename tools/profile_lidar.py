"""Fine-grained LiDAR-branch profiling on the attached chip.

Splits the sparse pipeline into voxelize / neighbour-map / subm conv /
downsample so optimisation lands where the time is."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, *a, reps=5):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    out = jax.block_until_ready(jfn(*a))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*a)
    jax.block_until_ready(out)
    r = (time.perf_counter() - t0) / reps
    print(f'{name:26s} compile {c:7.1f}s   run {r * 1e3:9.2f} ms', flush=True)
    return out


def main():
    import functools

    from streamingflow_tpu.config import Config
    from streamingflow_tpu.ops import sparse as S
    from streamingflow_tpu.ops.voxelize import LARGE_ID, linearize, voxelize

    cfg = Config().MODEL.SPARSE_ENCODER
    P = int(os.environ.get('NPTS', '80000'))
    T = int(os.environ.get('NSWEEPS', '5'))
    rng = np.random.RandomState(0)
    pts = rng.uniform(0, 1, size=(T, P, 5)).astype(np.float32)
    for d in range(3):
        lo, hi = cfg.POINT_CLOUD_RANGE[d], cfg.POINT_CLOUD_RANGE[d + 3]
        pts[..., d] = pts[..., d] * (hi - lo) + lo
    pts = jnp.asarray(pts)
    pmask = jnp.ones(pts.shape[:2], bool)

    vox_fn = jax.vmap(functools.partial(
        voxelize, point_cloud_range=cfg.POINT_CLOUD_RANGE,
        voxel_size=cfg.VOXEL_SIZE, max_points=cfg.MAX_NUM_POINTS,
        max_voxels=cfg.MAX_VOXELS))
    vox = timed(f'voxelize x{T} ({P} pts)', vox_fn, pts, pmask)

    shape = tuple(cfg.SPARSE_SHAPE)
    ids = jnp.where(vox.mask, linearize(vox.coords, shape), LARGE_ID)

    def nmap_fn(coords, ids, mask):
        def one(c, i, m):
            st = S.SparseTensor(jnp.zeros((i.shape[0], 1)), c, i, m, shape)
            return S.build_neighbor_map(st, 3)
        return jax.vmap(one)(coords, ids, mask)
    nmap = timed('neighbour map (V=120k)', nmap_fn, vox.coords, ids, vox.mask)

    w = jnp.asarray(rng.randn(27, 16, 16).astype(np.float32) * 0.05)
    feats16 = jnp.asarray(rng.randn(T, cfg.MAX_VOXELS, 16).astype(np.float32))

    def subm_fn(f, m, nm):
        return jax.vmap(lambda ff, mm, nn_: S.gather_gemm(ff, nn_, w, mm))(
            f, m, nm)
    timed('subm conv 16->16 (fused)', subm_fn, feats16, vox.mask, nmap)

    def down_fn(f, c, i, m):
        wd = jnp.asarray(rng.randn(27, 16, 32).astype(np.float32) * 0.05)
        def one(ff, cc, ii, mm):
            st = S.SparseTensor(ff, cc, ii, mm, shape)
            o = S.sparse_conv3d(st, wd, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                                cap=cfg.STAGE_CAPS[1])
            return o.feats
        return jax.vmap(one)(f, c, i, m)
    timed('downsample conv 16->32', down_fn, feats16, vox.coords, ids,
          vox.mask)


if __name__ == '__main__':
    main()
