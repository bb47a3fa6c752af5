"""Report sparse-engine occupancy vs the configured static capacities.

The TPU engines are static-shape: point clouds pad to MAX_VOXELS active
voxels, each encoder stage pads to STAGE_CAPS sites, and the tiled
engine pads to TILE_CAPS occupied tiles.  Overflow drops data silently
(documented, like the reference CUDA voxelizer's max_voxels), so caps
must be sized to the dataset.  This tool measures real occupancy per
stage — from synthetic LiDAR-like clouds or a dataset batch — and
prints each against its cap.

Usage:
    python tools/size_caps.py                    # synthetic, flagship cfg
    python tools/size_caps.py --config-file configs/....yml \
        [--dataroot /data/nuscenes] [--points 80000] [--samples 3]

Runs on CPU (forces jax_platforms=cpu; geometry only, no model).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np


def stage_occupancy(points, cfg):
    """Per-stage (active sites, occupied tiles, active columns) per cloud."""
    from streamingflow_tpu.ops import sparse as S
    from streamingflow_tpu.ops import sparse_tiled as ST
    from streamingflow_tpu.ops.voxelize import LARGE_ID, linearize, voxelize

    se = cfg.MODEL.SPARSE_ENCODER
    pts = jnp.asarray(points)
    mask = jnp.any(pts[:, :3] != 0, axis=-1)
    vox = voxelize(pts, mask, se.POINT_CLOUD_RANGE, se.VOXEL_SIZE,
                   se.MAX_NUM_POINTS, se.MAX_VOXELS)
    shape = tuple(se.SPARSE_SHAPE)
    ids = jnp.where(vox.mask, linearize(vox.coords, shape), LARGE_ID)
    st = S.SparseTensor(vox.feats, vox.coords, ids, vox.mask, shape)
    tile = tuple(se.TILE_SHAPE)

    rows = []
    stage_params = [((3, 3, 3), (2, 2, 2), (1, 1, 1)),
                    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
                    ((3, 3, 3), (2, 2, 2), (1, 1, 0))]
    for stage in range(4):
        tmap = ST.build_tile_map(st.coords, st.ids, st.mask, st.shape,
                                 cap_tiles=min(se.TILE_CAPS[stage] * 4,
                                               1 << 20), tile=tile)
        n_cols = int(len(np.unique(
            np.asarray(st.ids)[np.asarray(st.mask)] // st.shape[2])))
        rows.append((int(st.mask.sum()), int(tmap.tile_mask.sum()), n_cols))
        if stage < 3:
            k, s, p = stage_params[stage]
            out_shape = tuple(
                (st.shape[d] + 2 * p[d] - k[d]) // s[d] + 1 for d in range(3))
            # measure TRUE occupancy: stride-2 site generation dilates
            # (up to 8 candidates per input), so never clamp to the cap
            # being sized
            gen_cap = 8 * int(st.mask.sum()) + 8
            oi, oc, om = S.generate_output_sites(
                st, k, s, p, out_shape, gen_cap)
            st = S.SparseTensor(jnp.zeros((oi.shape[0], 1)), oc, oi, om,
                                out_shape)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config-file', default=None)
    ap.add_argument('--dataroot', default=None,
                    help='measure real dataset clouds instead of synthetic')
    ap.add_argument('--points', type=int, default=80000)
    ap.add_argument('--samples', type=int, default=3)
    args = ap.parse_args()

    from streamingflow_tpu.config import Config, load_cfg
    cfg = load_cfg(args.config_file) if args.config_file else Config()
    se = cfg.MODEL.SPARSE_ENCODER

    clouds = []
    if args.dataroot:
        cfg.DATASET.DATAROOT = args.dataroot
        from streamingflow_tpu.data.nuscenes import NuScenesDataset
        ds = NuScenesDataset(cfg, 'train')
        for i in range(min(args.samples, len(ds))):
            batch = ds[i]
            clouds.extend(np.asarray(batch['points']).reshape(
                -1, *batch['points'].shape[-2:]))
    else:
        from streamingflow_tpu.data.synthetic import _lidar_like_clouds
        rng = np.random.RandomState(0)
        clouds = list(_lidar_like_clouds(
            rng, (args.samples,), args.points, se.POINT_CLOUD_RANGE))

    worst = None
    for c in clouds:
        rows = stage_occupancy(c, cfg)
        worst = rows if worst is None else [
            tuple(max(x, y) for x, y in zip(a, b))
            for a, b in zip(worst, rows)]

    print(f'{len(clouds)} clouds, worst-case occupancy:')
    print(f'{"stage":>6} {"sites":>9} {"site cap":>9} {"fill":>6}   '
          f'{"tiles":>7} {"tile cap":>9} {"fill":>6}   '
          f'{"cols":>7} {"col cap":>9} {"fill":>6}')
    for i, (v, t, c) in enumerate(worst):
        vc, tc = se.STAGE_CAPS[i], se.TILE_CAPS[i]
        cc = se.COLUMN_CAPS[i]
        flag = '  OVERFLOW' if (v > vc or t > tc or c > cc) else ''
        print(f'{i + 1:>6} {v:>9} {vc:>9} {v / vc:>6.0%}   '
              f'{t:>7} {tc:>9} {t / tc:>6.0%}   '
              f'{c:>7} {cc:>9} {c / cc:>6.0%}{flag}')


if __name__ == '__main__':
    main()
