"""Lyft L5 dataset variant on a Lyft-schema fixture (flat category names,
no CAN bus).

Reference: datas/LyftData.py (FuturePredictionDatasetLyft:134) — same table
schema as nuScenes with flat categories and no canonical split; this
framework's variant (data/lyft.py) uses a deterministic hash split.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fixtures_nuscenes import make_mini_nuscenes  # noqa: E402


@pytest.fixture(scope='module')
def lyft_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('lyft'))
    # Lyft exports use flat category names ('car', not 'vehicle.car')
    make_mini_nuscenes(root, n_scenes=4, n_samples=6, n_sweeps_between=1,
                       category='car')
    return root


@pytest.fixture(scope='module')
def lyft_cfg(lyft_root):
    from streamingflow_tpu.config import Config
    cfg = Config()
    cfg.DATASET.DATAROOT = lyft_root
    cfg.DATASET.VERSION = 'mini'
    cfg.DATASET.NAME = 'lyft'
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
def lyft_sets(lyft_root, lyft_cfg):
    from streamingflow_tpu.data.lyft import FuturePredictionDatasetLyft
    from streamingflow_tpu.data.nuscenes_sdk import NuScenes
    nusc = NuScenes(version='v1.0-mini', dataroot=lyft_root)
    return (FuturePredictionDatasetLyft(nusc, 0, lyft_cfg),
            FuturePredictionDatasetLyft(nusc, 1, lyft_cfg), nusc)


def test_hash_split_partitions_scenes(lyft_sets):
    """The 80/20 hash split is a partition: disjoint, exhaustive, and
    deterministic across instantiations."""
    train, val, nusc = lyft_sets
    all_names = {s['name'] for s in nusc.scene}
    assert set(train.scenes).isdisjoint(val.scenes)
    assert set(train.scenes) | set(val.scenes) == all_names
    assert train.scenes == type(train)(nusc, 0, train.cfg).scenes


def test_flat_categories_rasterise_as_vehicles(lyft_sets):
    """'car' (no 'vehicle.' prefix) must still produce segmentation and
    instance labels (reference LyftData label path)."""
    train, val, _ = lyft_sets
    ds = train if len(train) else val
    assert len(ds) > 0
    item = ds[0]
    assert item['segmentation'].max() >= 1, 'car boxes must rasterise'
    assert item['instance'].max() >= 1
    assert item['pedestrian'].max() == 0
    # batch dict contract matches the nuScenes reader
    for key in ('image', 'intrinsics', 'extrinsics', 'future_egomotion',
                'points', 'camera_timestamp', 'lidar_timestamp',
                'target_timestamp'):
        assert key in item, key


def test_no_can_bus_planning_inputs_are_neutral(lyft_sets):
    """Lyft has no CAN bus: candidate trajectories are zeros and the
    command defaults to a valid code (reference LyftData omits planning)."""
    train, val, _ = lyft_sets
    ds = train if len(train) else val
    item = ds[0]
    assert np.all(item['sample_trajectory'] == 0)
    assert 0 <= int(item['command']) <= 3
    assert item['gt_trajectory'].shape[-1] == 3
