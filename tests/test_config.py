import textwrap

from streamingflow_tpu.config import Config, get_cfg, load_cfg


def test_defaults_match_reference():
    cfg = Config()
    # spot checks against reference streamingflow/config.py:32-211
    assert cfg.TIME_RECEPTIVE_FIELD == 3
    assert cfg.N_FUTURE_FRAMES == 4
    assert cfg.LIFT.D_BOUND == [2.0, 50.0, 1.0]
    assert cfg.MODEL.ENCODER.NAME == 'efficientnet-b4'
    assert cfg.MODEL.FUTURE_PRED.DELTA_T == 0.05
    assert cfg.SEMANTIC_SEG.VEHICLE.WEIGHTS == [1.0, 2.0]
    assert cfg.FUTURE_DISCOUNT == 0.95
    assert cfg.MODEL.SPARSE_ENCODER.SPARSE_SHAPE == (1600, 1600, 41)


def test_yaml_merge(tmp_path):
    yml = tmp_path / 'c.yml'
    yml.write_text(textwrap.dedent('''
        TAG: 'Prediction_LC_ODE_Variable'
        BATCHSIZE: 1
        MODEL:
          IMPUTE: True
          FUTURE_PRED:
            USE_VARIABLE_ODE_STEP: True
          MODALITY:
            USE_LIDAR: True
            USE_CAMERA: True
        SEMANTIC_SEG:
          PEDESTRIAN:
            ENABLED: False
        PLANNING:
          ENABLED: False
    '''))
    cfg = load_cfg(str(yml))
    assert cfg.TAG == 'Prediction_LC_ODE_Variable'
    assert cfg.BATCHSIZE == 1
    assert cfg.MODEL.IMPUTE is True
    assert cfg.MODEL.FUTURE_PRED.USE_VARIABLE_ODE_STEP is True
    assert cfg.MODEL.MODALITY.USE_CAMERA is True
    assert cfg.SEMANTIC_SEG.PEDESTRIAN.ENABLED is False
    assert cfg.PLANNING.ENABLED is False
    # untouched defaults survive
    assert cfg.MODEL.ENCODER.OUT_CHANNELS == 64


def test_opts_merge():
    cfg = Config().merge_opts(
        ['N_FUTURE_FRAMES', '6', 'MODEL.SOLVER', 'midpoint',
         'DATASET.FRAME_SKIP', '2', 'LIFT.DISCOUNT', '0.7',
         'MODEL.MODALITY.USE_CAMERA', 'True'])
    assert cfg.N_FUTURE_FRAMES == 6
    assert cfg.MODEL.SOLVER == 'midpoint'
    assert cfg.DATASET.FRAME_SKIP == 2
    assert cfg.LIFT.DISCOUNT == 0.7
    assert cfg.MODEL.MODALITY.USE_CAMERA is True


def test_get_cfg_dict_merge():
    cfg = get_cfg(cfg_dict={'EPOCHS': 5, 'MODEL': {'SOLVER': 'midpoint'}})
    assert cfg.EPOCHS == 5
    assert cfg.MODEL.SOLVER == 'midpoint'


def test_shipped_reference_config_loads():
    """The reference YAML must merge into our tree unmodified."""
    import yaml
    ref = '/root/reference/streamingflow/configs/Prediction_LC_ODE_Variable.yml'
    with open(ref) as f:
        d = yaml.safe_load(f)
    d.setdefault('MODEL', {}).pop('USE_GRU_ODE', None) or d
    cfg = Config().merge_dict(d)
    assert cfg.MODEL.FUTURE_PRED.USE_VARIABLE_ODE_STEP is True
    assert cfg.MODEL.MODALITY.USE_LIDAR and cfg.MODEL.MODALITY.USE_CAMERA
