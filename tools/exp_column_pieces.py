"""Piecewise timing of the column engine at flagship stage shapes.

Separates from_sites / column-map build / subm conv (per stage, per
formulation) / output-column generation / strided conv so optimisation
lands where the time is.  Chained-readback timing.

    python tools/exp_column_pieces.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from streamingflow_tpu.ops import sparse_columns as SC
from streamingflow_tpu.ops.voxelize import LARGE_ID


def chain_time(fn, args, reps=5, label=''):
    @jax.jit
    def step(chain, *a):
        out = fn(*a)
        leaves = [x for x in jax.tree.leaves(out)
                  if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype,
                                                            jnp.inexact)]
        s = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves) \
            if leaves else sum(jnp.sum(x.astype(jnp.int32)).astype(jnp.float32)
                               for x in jax.tree.leaves(out))
        return chain * 0.0 + s

    zero = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    float(step(zero, *args))
    c = time.perf_counter() - t0
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(zero))
    rtt = min(_t(lambda: float(tiny(zero))) for _ in range(3))
    t0 = time.perf_counter()
    s = zero
    for _ in range(reps):
        s = step(s, *args)
    float(s)
    dt = (time.perf_counter() - t0 - rtt) / reps
    print(f'{label:34s} compile {c:6.1f}s   run {dt * 1e3:9.2f} ms',
          flush=True)
    return dt


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def synth_columns(rng, n_cols, cap, grid, nz, c, fill=0.1, dtype=jnp.bfloat16):
    """A ColumnSet with n_cols active columns at z fill factor `fill`."""
    nx, ny = grid
    ids = np.sort(rng.choice(nx * ny, size=n_cols, replace=False)
                  ).astype(np.int32)
    pad = cap - n_cols
    col_ids = np.concatenate([ids, np.full(pad, LARGE_ID, np.int32)])
    coords = np.stack([col_ids // ny, col_ids % ny], -1)
    coords[n_cols:] = 0
    mask = np.arange(cap) < n_cols
    zmask = rng.random((cap, nz)) < fill
    zmask[:, 0] = True       # every active column has >= 1 site
    zmask &= mask[:, None]
    feats = rng.standard_normal((cap, nz * c), dtype=np.float32)
    feats *= np.repeat(zmask, c, -1)
    return SC.ColumnSet(jnp.asarray(feats, dtype), jnp.asarray(col_ids),
                        jnp.asarray(coords), jnp.asarray(mask),
                        jnp.asarray(zmask))


# flagship stage shapes: (grid, nz, C, active cols, cap)
STAGES = [
    ((1600, 1600), 41, 16, 56000, 65536),
    ((800, 800), 21, 32, 75000, 86016),
    ((400, 400), 11, 64, 59000, 69632),
    ((200, 200), 5, 128, 29000, 34816),
]


def main():
    print(f'device: {jax.devices()[0]}')
    rng = np.random.default_rng(0)
    only = os.environ.get('ONLY', '')

    if not only or 'entry' in only:
        # entry/exit pieces at flagship scale: voxelize + from_sites + BN
        import functools
        from streamingflow_tpu.config import Config
        from streamingflow_tpu.data.synthetic import _lidar_like_clouds
        from streamingflow_tpu.ops.voxelize import (LARGE_ID as LID,
                                                    linearize, voxelize)
        se = Config().MODEL.SPARSE_ENCODER
        pts = jnp.asarray(np.asarray(_lidar_like_clouds(
            np.random.RandomState(0), (5,), 80000, se.POINT_CLOUD_RANGE),
            np.float32))
        pm = jnp.ones(pts.shape[:2], bool)
        vox_fn = jax.vmap(functools.partial(
            voxelize, point_cloud_range=se.POINT_CLOUD_RANGE,
            voxel_size=se.VOXEL_SIZE, max_points=se.MAX_NUM_POINTS,
            max_voxels=se.MAX_VOXELS, out_dtype=jnp.bfloat16))
        chain_time(lambda p, m: vox_fn(p, m).feats, (pts, pm),
                   label='voxelize x5 (80k pts)')
        vox = vox_fn(pts, pm)
        shape = tuple(se.SPARSE_SHAPE)
        ids = jnp.where(vox.mask, linearize(vox.coords, shape), LID)
        chain_time(lambda f, i, m: jax.vmap(
            lambda a, b, c: SC.from_sites(a, b, c, shape, 65536))(
                f, i, m).feats,
            (vox.feats, ids, vox.mask), label='from_sites x5')

        # BN+relu+mask epilogue overhead at stage-2 shape
        from streamingflow_tpu.models.lidar_encoder import MaskedBatchNorm
        cs2 = synth_columns(rng, 75000, 86016, (800, 800), 21, 32, 0.1)
        bn = MaskedBatchNorm()
        bnv = bn.init(jax.random.PRNGKey(0), cs2.feats, cs2.zmask)
        chain_time(lambda f, zm: bn.apply(bnv, f, zm),
                   (cs2.feats, cs2.zmask), label='s2 BN(eval)+mask only')
        chain_time(lambda f, zm: bn.apply(bnv, f, zm, train=True,
                                          mutable=['batch_stats'])[0],
                   (cs2.feats, cs2.zmask), label='s2 BN(train)+mask only')
        chain_time(lambda f, ci, cc, cm, zm: SC.to_dense_bev(
            SC.ColumnSet(f, ci, cc, cm, zm), (200, 200), 2, 128),
            tuple(synth_columns(rng, 29000, 34816, (200, 200), 2, 128,
                                0.9)),
            label='to_dense_bev (200^2)')

    for i, (grid, nz, c, n, cap) in enumerate(STAGES):
        fill = {41: 0.04, 21: 0.1, 11: 0.2, 5: 0.45}[nz]
        cs = synth_columns(rng, n, cap, grid, nz, c, fill)
        w = jnp.asarray(rng.standard_normal((27, c, c)) * 0.1, jnp.bfloat16)

        if not only or 'map' in only:
            chain_time(lambda f, ci, cc, cm, zm: SC.build_column_map(
                SC.ColumnSet(f, ci, cc, cm, zm), grid).nbr,
                tuple(cs), label=f's{i+1} build_column_map')
        cmap = SC.build_column_map(cs, grid)
        if not only or 'plan' in only:
            chain_time(lambda *m: SC.build_window_plan(
                SC.ColumnMap(*m[:4]), m[4]).rel,
                tuple(cmap) + (cs.col_mask,),
                label=f's{i+1} build_window_plan')
        plan = SC.build_window_plan(cmap, cs.col_mask)
        if not only or 'subm' in only:
            for form in ('win', 'sep', 'banded', 'conv'):
                def run_subm(f, zm, *m, fm=form):
                    pl = SC.WindowPlan(*m[4:]) if fm == 'win' else None
                    return SC.subm_conv_columns(
                        f, zm, SC.ColumnMap(*m[:4]), w, formulation=fm,
                        plan=pl)
                args = (cs.feats, cs.zmask) + tuple(cmap)
                if form == 'win':
                    args = args + tuple(plan)
                chain_time(run_subm, args,
                           label=f's{i+1} subm {form} ({n}x{nz}x{c})')
            if int(plan.n_dropped):
                print(f'  !! s{i+1} win plan dropped {int(plan.n_dropped)}')
        if (not only or 'down' in only) and i < 3:
            pads = [(1, 1, 1), (1, 1, 1), (1, 1, 0)][i]
            shape3 = (grid[0], grid[1], nz)
            cap_out = STAGES[i + 1][4]
            cout = STAGES[i + 1][2]
            wd = jnp.asarray(rng.standard_normal((27, c, cout)) * 0.1,
                             jnp.bfloat16)
            chain_time(
                lambda f, ci, cc, cm, zm: SC.sparse_conv_columns(
                    SC.ColumnSet(f, ci, cc, cm, zm), wd, (3, 3, 3),
                    (2, 2, 2), pads, shape3, cap_out)[0].feats,
                tuple(cs), label=f's{i+1} down (banded)')


if __name__ == '__main__':
    main()
