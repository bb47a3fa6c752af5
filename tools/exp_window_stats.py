"""Source-window statistics for a block-sliced tap-gather formulation.

The column engine's subm conv cost is dominated by random row gathers at
~1.3 KB granularity (docs/PERF.md).  Because column ids are sorted
x-major, the source slot of a fixed in-plane tap (dx, dy) is MONOTONE in
the output slot (id' = id + dx*ny + dy preserves order), so a block of
consecutive output columns reads a CONTIGUOUS source window: one wide
slice per (block, dx-row) + an in-VMEM one-hot selection matmul could
replace the per-row gather.  Viability hinges on the window width needed
to cover a block's sources (overflow rows need a residual pass), which
this tool measures on realistic clouds at stage-1..4 occupancy.

    python tools/exp_window_stats.py [--block 256]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np


def column_ids_per_stage(points, cfg):
    """Sorted active-column id arrays per stage (incl. conv_input grid)."""
    from streamingflow_tpu.ops import sparse as S
    from streamingflow_tpu.ops.voxelize import LARGE_ID, linearize, voxelize

    se = cfg.MODEL.SPARSE_ENCODER
    pts = jnp.asarray(points)
    mask = jnp.any(pts[:, :3] != 0, axis=-1)
    vox = voxelize(pts, mask, se.POINT_CLOUD_RANGE, se.VOXEL_SIZE,
                   se.MAX_NUM_POINTS, se.MAX_VOXELS)
    shape = tuple(se.SPARSE_SHAPE)
    ids = jnp.where(vox.mask, linearize(vox.coords, shape), LARGE_ID)
    st = S.SparseTensor(vox.feats, vox.coords, ids, vox.mask, shape)

    out = []
    stage_params = [((3, 3, 3), (2, 2, 2), (1, 1, 1)),
                    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
                    ((3, 3, 3), (2, 2, 2), (1, 1, 0))]
    for stage in range(4):
        cids = np.unique(np.asarray(st.ids)[np.asarray(st.mask)]
                         // st.shape[2])
        out.append((cids.astype(np.int64), st.shape))
        if stage < 3:
            k, s, p = stage_params[stage]
            out_shape = tuple((st.shape[d] + 2 * p[d] - k[d]) // s[d] + 1
                              for d in range(3))
            (oi, oc, om), _ = S.generate_output_sites(
                st, k, s, p, out_shape, st.ids.shape[0] * 8, return_src=True)
            st = S.SparseTensor(jnp.zeros((oi.shape[0], 1)), oc, oi, om,
                                out_shape)
    return out


def window_stats(cids, ny, block):
    """Per-(dx in -1,+1) window width needed per block of sorted columns."""
    slot_of = {int(c): i for i, c in enumerate(cids)}
    res = {}
    for dx in (-1, 1):
        src = np.full(len(cids), -1, np.int64)
        tgt = cids + dx * ny            # dy=0; dy=+-1 add +-1 to the window
        for i, t in enumerate(tgt):
            s = slot_of.get(int(t))
            # window must cover dy in {-1,0,+1}: take the widest hit
            lo = slot_of.get(int(t - 1), s)
            hi = slot_of.get(int(t + 1), s)
            src[i] = s if s is not None else (lo if lo is not None else
                                              (hi if hi is not None else -1))
        spans = []
        n_blocks = (len(cids) + block - 1) // block
        for b in range(n_blocks):
            ss = src[b * block:(b + 1) * block]
            ss = ss[ss >= 0]
            if len(ss):
                spans.append(int(ss.max() - ss.min()) + 3)
        spans = np.asarray(spans) if spans else np.asarray([0])
        res[dx] = (int(np.max(spans)), int(np.percentile(spans, 99)),
                   int(np.percentile(spans, 90)), float(np.mean(spans)))
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--block', type=int, default=256)
    ap.add_argument('--points', type=int, default=80000)
    args = ap.parse_args()

    from streamingflow_tpu.config import Config
    from streamingflow_tpu.data.synthetic import _lidar_like_clouds

    cfg = Config()
    se = cfg.MODEL.SPARSE_ENCODER
    rng = np.random.RandomState(7)
    cloud = _lidar_like_clouds(rng, (1,), args.points, se.POINT_CLOUD_RANGE)[0]
    stages = column_ids_per_stage(cloud, cfg)
    print(f'block={args.block}')
    for i, (cids, shape) in enumerate(stages):
        ny = shape[1]
        st = window_stats(cids, ny, args.block)
        print(f'stage {i + 1}: {len(cids)} cols, grid {shape[0]}x{shape[1]}')
        for dx in (-1, 1):
            mx, p99, p90, mean = st[dx]
            print(f'  dx={dx:+d}: window max {mx}  p99 {p99}  p90 {p90}  '
                  f'mean {mean:.0f}  (block {args.block})')


if __name__ == '__main__':
    main()
