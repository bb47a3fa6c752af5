"""End-to-end train CLI on the on-disk fixture: YAML config -> dataloaders
-> jitted data-parallel step -> checkpoints -> auto-resume.

Mirrors the reference train.py flow (main:44, auto-resume :15-41) at micro
scale."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fixtures_nuscenes import make_mini_nuscenes  # noqa: E402


@pytest.fixture(scope='module')
def train_env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('nusc_train'))
    make_mini_nuscenes(root, n_scenes=2, n_samples=6, n_sweeps_between=1)
    log_dir = str(tmp_path_factory.mktemp('logs'))
    cfg_yml = os.path.join(log_dir, 'micro.yml')
    with open(cfg_yml, 'w') as f:
        f.write(f"""
LOG_DIR: '{log_dir}'
TAG: 'micro'
EPOCHS: 1
BATCHSIZE: 1
N_WORKERS: 0
LOGGING_INTERVAL: 1
VIS_INTERVAL: 2
TIME_RECEPTIVE_FIELD: 2
N_FUTURE_FRAMES: 2
DATASET:
  DATAROOT: '{root}'
  VERSION: 'mini'
  FRAME_SKIP: 5
IMAGE:
  NAMES: ['CAM_FRONT', 'CAM_BACK']
  ORIGINAL_WIDTH: 160
  ORIGINAL_HEIGHT: 90
  FINAL_DIM: [32, 64]
  RESIZE_SCALE: 0.5
  TOP_CROP: 8
LIFT:
  X_BOUND: [-16.0, 16.0, 0.5]
  Y_BOUND: [-16.0, 16.0, 0.5]
  D_BOUND: [2.0, 10.0, 1.0]
  GT_DEPTH: False
MODEL:
  ENCODER:
    NAME: 'efficientnet-b0'
    OUT_CHANNELS: 16
  TEMPORAL_MODEL:
    START_OUT_CHANNELS: 16
  DISTRIBUTION:
    LATENT_DIM: 16
  SMALL_ENCODER:
    FILTER_SIZE: 8
  MODALITY:
    USE_CAMERA: True
    USE_LIDAR: False
SEMANTIC_SEG:
  PEDESTRIAN:
    ENABLED: False
  HDMAP:
    ENABLED: False
PLANNING:
  ENABLED: False
""")
    return cfg_yml, log_dir


def _run_main(cfg_yml, monkeypatch):
    import train
    monkeypatch.setattr(sys, 'argv', ['train.py', '--config-file', cfg_yml])
    train.main()


def test_train_cli_end_to_end_and_resume(train_env, monkeypatch, capsys):
    cfg_yml, log_dir = train_env
    _run_main(cfg_yml, monkeypatch)
    out1 = capsys.readouterr().out
    assert 'loss' in out1
    ckpt_dir = os.path.join(log_dir, 'micro', 'checkpoints')
    assert os.path.isdir(ckpt_dir)
    steps = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
    assert steps, 'an epoch checkpoint must be written'

    # in-training validation ran and printed epoch metrics
    # (reference trainer.py:226-281)
    assert 'val vehicle_iou=' in out1

    # BEV video logged at VIS_INTERVAL (reference trainer.py:396-409):
    # tensorboard event or npz fallback next to the scalars
    run_dir = os.path.join(log_dir, 'micro')
    arts = []
    for root, _, files in os.walk(run_dir):
        arts += [f for f in files
                 if f.startswith('events') or f.endswith('.npz')]
    assert arts, 'a train_outputs video artifact must exist'

    # second invocation resumes from the saved epoch and does nothing more
    _run_main(cfg_yml, monkeypatch)
    out2 = capsys.readouterr().out
    assert 'resuming from checkpoint step 1' in out2


def test_warm_start_partial_load(train_env, monkeypatch):
    """Single-frame warm start loads matching non-decoder tensors and leaves
    the decoder at its fresh init (reference train.py:50-58)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from streamingflow_tpu.config import load_cfg
    from streamingflow_tpu.data.dataloader import prepare_dataloaders
    from streamingflow_tpu.training import trainer as TR
    from streamingflow_tpu.training.checkpoint import (CheckpointManager,
                                                       warm_start)

    cfg_yml, log_dir = train_env
    ckpt_dir = os.path.join(log_dir, 'micro', 'checkpoints')
    if not os.path.isdir(ckpt_dir):          # run training if needed
        _run_main(cfg_yml, monkeypatch)
    cfg = load_cfg(cfg_yml)
    _, valloader = prepare_dataloaders(cfg)
    batch = {k: jnp.asarray(v) for k, v in next(iter(valloader)).items()
             if isinstance(v, np.ndarray)}
    fresh = TR.create_train_state(cfg, jax.random.PRNGKey(7), batch)
    loaded, n = warm_start(fresh, ckpt_dir)
    assert n > 0
    trained = CheckpointManager(ckpt_dir).restore(fresh)

    # encoder weights match the checkpoint...
    enc_key = next(k for k in fresh.params['model'] if 'encoder' in k.lower())
    got = jax.tree.leaves(loaded.params['model'][enc_key])[0]
    want = jax.tree.leaves(trained.params['model'][enc_key])[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # ...decoder stays at the fresh init
    dec_fresh = jax.tree.leaves(fresh.params['model']['decoder'])[0]
    dec_loaded = jax.tree.leaves(loaded.params['model']['decoder'])[0]
    np.testing.assert_array_equal(np.asarray(dec_loaded),
                                  np.asarray(dec_fresh))
