"""Chained-readback microbench of the tiled sparse engine at flagship
stage-1 shapes, on a realistic (LiDAR-like) cloud.

Times each piece — build_tile_map, to_tiles, halo_exchange, the dense
tile conv, from_tiles, a full resident subm conv, the strided tiled
conv — and the gather-engine equivalents for comparison.  Usage:
    python tools/exp_sparse_tiled.py [n_points]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from streamingflow_tpu.data.synthetic import _lidar_like_clouds
from streamingflow_tpu.ops import sparse as S
from streamingflow_tpu.ops import sparse_tiled as ST
from streamingflow_tpu.ops.voxelize import LARGE_ID, voxelize

REPS = 5
PC_RANGE = [-50.0, -50.0, -5.0, 50.0, 50.0, 3.0]
VOXEL = [0.0625, 0.0625, 0.2]
SHAPE = (1600, 1600, 41)
V_CAP = 120000
T_CAP = 24576
OUT_CAP = 60000


def main():
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 80000
    rng = np.random.RandomState(0)
    pts = jnp.asarray(_lidar_like_clouds(rng, (1,), n_points, PC_RANGE)[0])
    pt_mask = jnp.any(pts[:, :3] != 0, axis=-1)
    vox = jax.jit(lambda p, m: voxelize(p, m, PC_RANGE, VOXEL, 10, V_CAP))(
        pts, pt_mask)
    # re-linearise into SHAPE id space (z 40 -> 41)
    from streamingflow_tpu.ops.voxelize import linearize
    ids = jnp.where(vox.mask, linearize(vox.coords, SHAPE), LARGE_ID)
    st = S.SparseTensor(vox.feats.astype(jnp.bfloat16), vox.coords, ids,
                        vox.mask, SHAPE)
    print(f'V = {int(st.mask.sum())} / cap {V_CAP}', flush=True)
    w16 = jnp.asarray(rng.randn(27, 5, 16), jnp.bfloat16) * 0.1
    w1616 = jnp.asarray(rng.randn(27, 16, 16), jnp.bfloat16) * 0.1
    wd = jnp.asarray(rng.randn(27, 16, 32), jnp.bfloat16) * 0.1

    zero = jnp.zeros((), jnp.float32)
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(zero))
    rtt = min((lambda t0: (float(tiny(zero)), time.perf_counter() - t0))(
        time.perf_counter())[1] for _ in range(3))
    print(f'rtt {rtt*1e3:.1f} ms', flush=True)

    def timed(name, fn):
        jfn = jax.jit(fn)
        chain = jax.jit(lambda s: s * 0.0 + jax.tree.reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), jfn(), 0.0))
        jax.block_until_ready(jfn())
        float(chain(zero))
        t0 = time.perf_counter()
        s = zero
        for _ in range(REPS):
            s = chain(s)
        float(s)
        run = (time.perf_counter() - t0 - rtt) / REPS
        print(f'{name:44s} {run*1e3:9.2f} ms', flush=True)
        return jfn

    timed('build_tile_map (V=120k cap 24k)',
          lambda: tuple(ST.build_tile_map(st.coords, st.ids, st.mask, SHAPE,
                                          T_CAP)[:6]))
    tmap = ST.TileMap(*jax.jit(lambda: tuple(ST.build_tile_map(
        st.coords, st.ids, st.mask, SHAPE, T_CAP)))())
    print(f'occupied tiles = {int(tmap.tile_mask.sum())} / {T_CAP}',
          flush=True)

    feats16 = jnp.asarray(rng.randn(V_CAP, 16), jnp.bfloat16)
    timed('to_tiles (16ch)', lambda: ST.to_tiles(feats16, tmap, st.mask))
    tiles = jax.jit(lambda: ST.to_tiles(feats16, tmap, st.mask))()
    timed('halo_exchange (16ch)', lambda: ST.halo_exchange(tiles, tmap))
    timed('dense tile conv 16->16 (halo incl.)',
          lambda: ST.subm_conv_tiles(tiles, tmap, w1616))
    timed('from_tiles (16ch)', lambda: ST.from_tiles(tiles, tmap, st.mask))
    timed('resident subm conv 16->16 (halo+conv)',
          lambda: ST.subm_conv_tiles(tiles, tmap, w1616))

    # strided conv: tiled vs gather
    out_shape = tuple((SHAPE[d] + 2 * 1 - 3) // 2 + 1 for d in range(3))
    sites_fn = jax.jit(lambda: S.generate_output_sites(
        st, (3, 3, 3), (2, 2, 2), (1, 1, 1), out_shape, OUT_CAP,
        return_src=True))
    timed('generate_output_sites+src (s2)', lambda: (
        sites_fn()[0][0], sites_fn()[1]))
    (oi, oc, om), src = sites_fn()
    print(f'V_out = {int(om.sum())} / cap {OUT_CAP}', flush=True)
    timed('strided tiled conv 16->32 (given sites)',
          lambda: ST.sparse_conv_tiles(tiles, tmap, st.coords, wd,
                                       (3, 3, 3), (2, 2, 2), (1, 1, 1),
                                       oc, om, src))
    st16 = st._replace(feats=feats16)
    timed('gather-engine full sparse_conv3d 16->32',
          lambda: S.sparse_conv3d(st16, wd, (3, 3, 3), (2, 2, 2),
                                  (1, 1, 1), OUT_CAP).feats)
    timed('gather-engine build_neighbor_map',
          lambda: tuple(S.build_neighbor_map(st, 3)))


if __name__ == '__main__':
    main()
