"""End-to-end reader tests on a generated on-disk nuScenes-format fixture.

Covers the real data path of reference datas/NuscenesData.py:739-907: table
loading, window indexing, image load/normalise, label rasterisation,
egomotion, multisweep grouping, relative timestamps — and the Lyft variant.
"""
import os

import numpy as np
import pytest

import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fixtures_nuscenes import make_mini_nuscenes  # noqa: E402


@pytest.fixture(scope='module')
def dataroot(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('nusc'))
    make_mini_nuscenes(root, n_scenes=2, n_samples=9, n_sweeps_between=1)
    return root


@pytest.fixture(scope='module')
def cfg(dataroot):
    from streamingflow_tpu.config import Config
    cfg = Config()
    cfg.DATASET.DATAROOT = dataroot
    cfg.DATASET.VERSION = 'mini'
    cfg.TIME_RECEPTIVE_FIELD = 2
    cfg.N_FUTURE_FRAMES = 2
    cfg.IMAGE.NAMES = ['CAM_FRONT', 'CAM_BACK']
    cfg.IMAGE.ORIGINAL_WIDTH = 160
    cfg.IMAGE.ORIGINAL_HEIGHT = 90
    cfg.IMAGE.FINAL_DIM = (32, 64)
    cfg.IMAGE.RESIZE_SCALE = 0.5
    cfg.IMAGE.TOP_CROP = 8
    cfg.LIFT.X_BOUND = [-16.0, 16.0, 0.5]
    cfg.LIFT.Y_BOUND = [-16.0, 16.0, 0.5]
    cfg.LIFT.GT_DEPTH = False
    cfg.DATASET.FRAME_SKIP = 5
    return cfg


@pytest.fixture(scope='module')
def nusc(dataroot):
    from streamingflow_tpu.data.nuscenes_sdk import NuScenes
    return NuScenes(version='v1.0-mini', dataroot=dataroot)


def test_tables_and_decoration(nusc):
    assert len(nusc.scene) == 2
    ann = nusc.sample_annotation[0]
    assert ann['category_name'] == 'vehicle.car'
    s = nusc.sample[0]
    assert 'LIDAR_TOP' in s['data'] and 'CAM_FRONT' in s['data']
    assert len(s['anns']) == 1


def test_getitem_contract(nusc, cfg):
    from streamingflow_tpu.data.nuscenes import (MAX_LIDAR_POINTS,
                                                 FuturePredictionDataset)
    ds = FuturePredictionDataset(nusc, 0, cfg)
    assert len(ds) > 0
    item = ds[0]

    S, F = cfg.TIME_RECEPTIVE_FIELD, cfg.N_FUTURE_FRAMES
    T = S + F
    assert item['image'].shape == (S, 2, 32, 64, 3)
    assert item['intrinsics'].shape == (S, 2, 3, 3)
    assert item['extrinsics'].shape == (S, 2, 4, 4)
    nx = int((cfg.LIFT.X_BOUND[1] - cfg.LIFT.X_BOUND[0]) / cfg.LIFT.X_BOUND[2])
    assert item['segmentation'].shape == (T, nx, nx, 1)
    assert item['instance'].shape == (T, nx, nx)
    assert item['future_egomotion'].shape == (T, 6)
    assert item['points'].shape[0] >= 1
    assert item['points'].shape[1:] == (MAX_LIDAR_POINTS, 5)
    assert item['camera_timestamp'].shape == (S,)
    assert item['target_timestamp'].shape == (T,)

    # relative timestamps: present keyframe at 0, past negative, 0.5 s grid
    np.testing.assert_allclose(item['camera_timestamp'][-1], 0.0, atol=1e-3)
    np.testing.assert_allclose(np.diff(item['target_timestamp']), 0.5,
                               atol=1e-2)
    assert (item['lidar_timestamp'] <= 1e-3).all()

    # forward egomotion ~2 m per 0.5 s step along x; the 6-DoF vector is the
    # pose of frame t expressed in frame t+1, so the old origin sits at -2
    np.testing.assert_allclose(item['future_egomotion'][:-1, 0], -2.0,
                               atol=0.1)
    # the annotated box rasterises into the segmentation raster
    assert item['segmentation'].sum() > 0
    assert item['instance'].max() >= 1
    # labels: center/offset/flow generated
    assert item['centerness'].shape == (T, nx, nx, 1)
    assert item['offset'].shape == (T, nx, nx, 2)
    assert item['flow'].shape == (T, nx, nx, 2)


def test_gt_trajectory_and_command(nusc, cfg):
    from streamingflow_tpu.data.nuscenes import FuturePredictionDataset
    ds = FuturePredictionDataset(nusc, 0, cfg)
    item = ds[0]
    gt = item['gt_trajectory']
    assert gt.shape == (cfg.N_FUTURE_FRAMES + 1, 3)
    # displacement grows ~2 m per step along the lidar-frame x axis
    np.testing.assert_allclose(np.diff(gt[:, 0]), 2.0, atol=0.2)
    # command rule (reference NuscenesData.py:639-644): x >= 2 -> RIGHT.
    # The fixture's lidar calibration is identity (real nuScenes mounts the
    # lidar ~90 deg rotated, making x lateral), so the rule fires RIGHT here.
    assert int(item['command']) == 2


def test_windows_do_not_cross_scenes(nusc, cfg):
    from streamingflow_tpu.data.nuscenes import FuturePredictionDataset
    ds = FuturePredictionDataset(nusc, 0, cfg)
    for idx_row in ds.indices:
        scene_toks = {ds.ixes[i]['scene_token'] for i in idx_row}
        assert len(scene_toks) == 1


def test_lyft_variant(dataroot, cfg):
    from streamingflow_tpu.data.lyft import FuturePredictionDatasetLyft
    from streamingflow_tpu.data.nuscenes_sdk import NuScenes

    # lyft-style: flat category names
    lyft_root = os.path.join(dataroot, '..', 'lyft')
    make_mini_nuscenes(str(lyft_root), version='v1.01-train', n_scenes=3,
                       n_samples=6, category='car')
    nusc = NuScenes(version='v1.01-train', dataroot=str(lyft_root))
    train = FuturePredictionDatasetLyft(nusc, 0, cfg)
    val = FuturePredictionDatasetLyft(nusc, 1, cfg)
    assert set(train.scenes).isdisjoint(val.scenes)
    assert len(train.scenes) + len(val.scenes) == 3
    ds = train if len(train) else val
    item = ds[0]
    assert item['segmentation'].sum() > 0          # 'car' counted as vehicle
    # no CAN bus: zero candidate trajectories
    assert (item['sample_trajectory'] == 0).all()


def test_dataloader_batching(nusc, cfg):
    from streamingflow_tpu.data.dataloader import DataLoader
    from streamingflow_tpu.data.nuscenes import FuturePredictionDataset
    ds = FuturePredictionDataset(nusc, 0, cfg)
    dl = DataLoader(ds, batch_size=2, shuffle=False, drop_last=True)
    batch = next(iter(dl))
    assert batch['image'].shape[0] == 2
    assert batch['points'].ndim == 4


def test_multisweep_labels(nusc, cfg):
    """USE_MULTISWEEP expands frames [rf-1, seq-1) into per-sweep labels on
    the sweep lattice with interpolated boxes (reference
    NuscenesData.py:819-841, get_birds_eye_view_label_multisweep:323-378)."""
    import copy

    from streamingflow_tpu.data.nuscenes import FuturePredictionDataset

    ms_cfg = copy.deepcopy(cfg)
    ms_cfg.DATASET.USE_MULTISWEEP = True
    ms_cfg.DATASET.MULTISWEEP_NSWEEPS = 2   # fixture has 1 sweep between kf
    ds = FuturePredictionDataset(nusc, 0, ms_cfg)
    item = ds[0]

    rf, F = ms_cfg.TIME_RECEPTIVE_FIELD, ms_cfg.N_FUTURE_FRAMES
    seq = rf + F
    n_exp = (rf - 1) + (seq - rf) * 2 + 1       # expanded target count
    assert item['target_timestamp'].shape == (n_exp,)
    assert item['segmentation'].shape[0] == n_exp
    assert item['instance'].shape[0] == n_exp
    assert item['future_egomotion'].shape == (n_exp, 6)

    tt = item['target_timestamp']
    assert (np.diff(tt) > 0).all()              # strictly increasing times
    # expanded region has sub-keyframe spacing (fixture sweeps at 0.05 s
    # before the next keyframe -> gaps of 0.45/0.05 s)
    gaps = np.diff(tt[rf - 1:])
    assert gaps.min() < 0.45 + 1e-6
    # intermediate sweeps carry static egomotion; keyframe steps move ~2 m
    ego = item['future_egomotion']
    assert np.abs(ego).sum() > 0
    zero_rows = np.abs(ego).sum(axis=1) < 1e-6
    assert zero_rows.any()
    # labels still rasterise the moving box, including at interpolated sweeps
    assert item['segmentation'].sum() > 0
    exp_slice = item['segmentation'][rf - 1:rf - 1 + 2]
    assert exp_slice.sum() > 0


def test_interpolated_box_moves_between_keyframes(nusc):
    """Devkit-style interpolation: a sweep between keyframes gets a box
    between the bracketing annotations."""
    from streamingflow_tpu.data.nuscenes_sdk import get_instance_box

    sample1 = [s for s in nusc.sample
               if s['scene_token'] == 'scene0'][1]     # second keyframe
    sd_tok = sample1['data']['LIDAR_TOP']
    sd = nusc.get('sample_data', sd_tok)
    prev_sd = nusc.get('sample_data', sd['prev'])      # the sweep before it
    assert not prev_sd['is_key_frame']
    inst = nusc.sample_annotation[0]['instance_token']

    box_key = get_instance_box(nusc, sd_tok, inst)
    box_sweep = get_instance_box(nusc, prev_sd['token'], inst)
    assert box_key is not None and box_sweep is not None
    # fixture box moves +2 m in x per 0.5 s keyframe; the sweep 0.05 s before
    # the keyframe sits 0.2 m behind it
    dx = box_key.center[0] - box_sweep.center[0]
    np.testing.assert_allclose(dx, 2.0 * 0.1, atol=1e-6)


def test_online_depth_from_lidar(nusc, cfg):
    """GEN.GEN_DEPTH projects the keyframe lidar into the camera (reference
    get_depth_from_lidar, NuscenesData.py:313-321)."""
    import copy

    from streamingflow_tpu.data.nuscenes import FuturePredictionDataset
    from streamingflow_tpu.data.nuscenes_sdk import map_pointcloud_to_image

    d_cfg = copy.deepcopy(cfg)
    d_cfg.LIFT.GT_DEPTH = True
    d_cfg.GEN.GEN_DEPTH = True
    ds = FuturePredictionDataset(nusc, 0, d_cfg)
    item = ds[0]
    S = d_cfg.TIME_RECEPTIVE_FIELD
    fh, fw = d_cfg.IMAGE.FINAL_DIM
    assert item['depths'].shape == (S, 2, fh, fw)
    # sparse: most pixels are the -1 sentinel, some carry positive depth
    assert (item['depths'] == -1).mean() > 0.5
    assert (item['depths'] > 0).any()

    # projection sanity: all returned pixels in-image, depths past min_dist
    rec = ds.ixes[ds.indices[0][0]]
    lidar_sd = nusc.get('sample_data', rec['data']['LIDAR_TOP'])
    cam_sd = nusc.get('sample_data', rec['data']['CAM_FRONT'])
    uv, d = map_pointcloud_to_image(nusc, lidar_sd, cam_sd, (160, 90))
    assert (d > 1.0).all()
    assert (uv[0] > 1).all() and (uv[0] < 159).all()
    assert (uv[1] > 1).all() and (uv[1] < 89).all()


def test_radar_loading(nusc, cfg, dataroot):
    """PCD parsing with devkit filters + multi-channel ego-frame aggregation
    (reference RadarPointCloud.from_file data_classes.py:1053, LyftData
    get_radar_data:540, enabled by MODEL.MODALITY.USE_RADAR)."""
    import copy

    from streamingflow_tpu.data.nuscenes import FuturePredictionDataset
    from streamingflow_tpu.data.nuscenes_sdk import load_radar_points

    rec = nusc.sample[0]
    sd = nusc.get('sample_data', rec['data']['RADAR_FRONT'])
    pts = load_radar_points(os.path.join(dataroot, sd['filename']))
    assert pts.shape[0] == 18
    assert pts.shape[1] == 39            # 40 returns, 1 filtered out
    assert (pts[0] > 0).all()            # x forward in sensor frame

    r_cfg = copy.deepcopy(cfg)
    r_cfg.MODEL.MODALITY.USE_RADAR = True
    ds = FuturePredictionDataset(nusc, 0, r_cfg)
    item = ds[0]
    T = r_cfg.TIME_RECEPTIVE_FIELD + r_cfg.N_FUTURE_FRAMES
    assert item['radar_pointclouds'].shape == (T, 19, 700)
    # aggregated returns carry a time-lag channel and land in ego frame
    valid = np.abs(item['radar_pointclouds'][0, :3]).sum(0) > 0
    assert valid.sum() > 0


def test_multisweep_label_failure_marks_invalid(nusc, cfg, monkeypatch):
    """Label exceptions mark the sample invalid (reference
    NuscenesData.py:840-841) and the loader drops it."""
    import copy

    from streamingflow_tpu.data.dataloader import DataLoader
    from streamingflow_tpu.data.nuscenes import FuturePredictionDataset

    ms_cfg = copy.deepcopy(cfg)
    ms_cfg.DATASET.USE_MULTISWEEP = True
    ms_cfg.DATASET.MULTISWEEP_NSWEEPS = 2
    ds = FuturePredictionDataset(nusc, 0, ms_cfg)
    monkeypatch.setattr(FuturePredictionDataset, 'get_label_multisweep',
                        lambda *a, **k: (_ for _ in ()).throw(RuntimeError()))
    item = ds[0]
    assert item['status'] == 'invalid'

    dl = DataLoader(ds, batch_size=1, shuffle=False)
    assert sum(1 for _ in dl) == 0      # every sample dropped


def test_lidar_range_data(nusc, cfg):
    """USE_RANGE: ego-frame lidar returns with time-lag channel, padded
    (reference LyftData get_lidar_range_data:264, NuscenesData.py:853)."""
    import copy

    from streamingflow_tpu.data.nuscenes import FuturePredictionDataset

    r_cfg = copy.deepcopy(cfg)
    r_cfg.MODEL.LIDAR.USE_RANGE = True
    ds = FuturePredictionDataset(nusc, 0, r_cfg)
    item = ds[0]
    T = r_cfg.TIME_RECEPTIVE_FIELD + r_cfg.N_FUTURE_FRAMES
    assert item['range_clouds'].shape == (T, 5, 35000)
    valid = np.abs(item['range_clouds'][0, :3]).sum(0) > 0
    assert valid.sum() > 0                      # real returns present
    # time-lag channel of the single-sweep call is ~0 for valid points
    lags = item['range_clouds'][0, 4, valid]
    np.testing.assert_allclose(lags, 0.0, atol=1e-3)
