"""Static-capacity sizing: the flagship caps must hold real occupancy,
anchored to BOTH the synthetic LiDAR-like generator and the repo's
on-disk nuScenes fixture pipeline (VERDICT r3 item 6).

The engines drop sites past their static caps silently (documented),
which is only acceptable when the caps exceed realistic occupancy.
Stride-2 site generation DILATES the active set (each input touches up
to 8 output cells), so later stages need more slots than stage 1 — a
regression here means flagship-scale numerics silently diverge from the
reference, which never caps.  tools/size_caps.py is the sizing tool;
this test pins its result for one realistic 80k-point cloud against the
shipped defaults."""
import numpy as np

from streamingflow_tpu.config import Config


def test_flagship_caps_fit_realistic_cloud():
    import tools.size_caps as SC

    cfg = Config()
    se = cfg.MODEL.SPARSE_ENCODER
    from streamingflow_tpu.data.synthetic import _lidar_like_clouds
    rng = np.random.RandomState(7)
    cloud = _lidar_like_clouds(rng, (1,), 80000, se.POINT_CLOUD_RANGE)[0]
    rows = SC.stage_occupancy(cloud, cfg)
    for i, (sites, tiles, cols) in enumerate(rows):
        assert sites <= se.STAGE_CAPS[i], \
            f'stage {i + 1}: {sites} sites > cap {se.STAGE_CAPS[i]}'
        assert tiles <= se.TILE_CAPS[i], \
            f'stage {i + 1}: {tiles} tiles > cap {se.TILE_CAPS[i]}'
        assert cols <= se.COLUMN_CAPS[i], \
            f'stage {i + 1}: {cols} columns > cap {se.COLUMN_CAPS[i]}'
        # caps should not be wildly oversized either (memory is linear
        # in them) — at least 40% fill on the site caps
        assert sites >= 0.4 * se.STAGE_CAPS[i], \
            f'stage {i + 1}: cap {se.STAGE_CAPS[i]} oversized for {sites}'


def test_flagship_caps_fit_fixture_multisweep_cloud(tmp_path):
    """Anchor the caps to the REAL data pipeline: a multisweep cloud
    produced by the nuScenes reader on the on-disk fixture, density-boosted
    to the flagship 80k points by replicating points with sub-voxel jitter
    (preserves the cloud's spatial/vertical structure — the quantity the
    synthetic generator can only approximate)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures_nuscenes import make_mini_nuscenes
    import tools.size_caps as SC
    from streamingflow_tpu.data.nuscenes import FuturePredictionDataset
    from streamingflow_tpu.data.nuscenes_sdk import NuScenes

    root = str(tmp_path / 'nusc')
    make_mini_nuscenes(root, n_scenes=1, n_samples=7, n_sweeps_between=1)
    cfg = Config()
    cfg.DATASET.DATAROOT = root
    cfg.DATASET.VERSION = 'mini'
    cfg.TIME_RECEPTIVE_FIELD = 2
    cfg.N_FUTURE_FRAMES = 2
    cfg.IMAGE.NAMES = ['CAM_FRONT', 'CAM_BACK']
    cfg.IMAGE.ORIGINAL_WIDTH = 160
    cfg.IMAGE.ORIGINAL_HEIGHT = 90
    cfg.IMAGE.FINAL_DIM = (32, 64)
    cfg.IMAGE.RESIZE_SCALE = 0.5
    cfg.IMAGE.TOP_CROP = 8
    cfg.LIFT.GT_DEPTH = False
    cfg.DATASET.FRAME_SKIP = 5
    ds = FuturePredictionDataset(NuScenes(version='v1.0-mini',
                                          dataroot=root), 0, cfg)
    item = ds[0]
    pts = item['points'].reshape(-1, 5)
    pts = pts[np.any(pts[:, :3] != 0, axis=1)]
    assert len(pts) > 100, 'fixture cloud unexpectedly empty'

    se = cfg.MODEL.SPARSE_ENCODER
    rng = np.random.RandomState(0)
    reps = int(np.ceil(80000 / len(pts)))
    boosted = np.tile(pts, (reps, 1))[:80000]
    # jitter spans a few voxels so the boost widens occupancy the way a
    # denser return pattern would, instead of stacking exact duplicates
    boosted[:, :3] += rng.randn(len(boosted), 3).astype(np.float32) \
        * np.asarray(se.VOXEL_SIZE, np.float32) * 2.0

    rows = SC.stage_occupancy(boosted.astype(np.float32), cfg)
    for i, (sites, tiles, cols) in enumerate(rows):
        assert sites <= se.STAGE_CAPS[i], \
            f'stage {i + 1}: {sites} fixture sites > cap {se.STAGE_CAPS[i]}'
        assert cols <= se.COLUMN_CAPS[i], \
            f'stage {i + 1}: {cols} fixture columns > cap ' \
            f'{se.COLUMN_CAPS[i]}'


def test_column_cap_overflow_is_observable():
    """When the entry column cap truncates a cloud, the ladder must COUNT
    the dropped sites into the 'diagnostics' collection (eval_forward
    surfaces them; train.py/evaluate.py warn) — silent data loss is the
    failure mode this guards."""
    import jax
    import jax.numpy as jnp
    from streamingflow_tpu.models.lidar_encoder import LidarBEVEncoder

    se = Config().MODEL.SPARSE_ENCODER
    se.POINT_CLOUD_RANGE = [-4.0, -4.0, -4.0, 4.0, 4.0, 3.68]
    se.VOXEL_SIZE = [0.25, 0.25, 0.32]
    se.SPARSE_SHAPE = (32, 32, 25)
    se.MAX_VOXELS = 512
    se.STAGE_CAPS = [512, 256, 128, 64]
    se.COLUMN_CAPS = [8, 8, 8, 8]      # absurdly small: force overflow
    se.ENGINE = 'column'
    se.DENSE_TAIL_FROM_STAGE = 3
    model = LidarBEVEncoder(se)
    rng = np.random.RandomState(1)
    pts = rng.uniform(-4, 3.5, size=(1, 1, 256, 5)).astype(np.float32)
    v = model.init({'params': jax.random.PRNGKey(0)}, jnp.asarray(pts))
    _, upd = model.apply(v, jnp.asarray(pts), mutable=['diagnostics'])
    leaves = {'/'.join(str(k) for k in p): x for p, x in
              jax.tree_util.tree_leaves_with_path(upd['diagnostics'])}
    dropped = [x for p, x in leaves.items() if 'dropped_sites_entry' in p]
    assert dropped and int(dropped[0]) > 0
