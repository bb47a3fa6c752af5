"""End-to-end model tests on the tiny config (camera-only and fusion)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamingflow_tpu.data import make_batch, tiny_config
from streamingflow_tpu.models import StreamingFlow
from streamingflow_tpu.training import trainer as TR

KEY = jax.random.PRNGKey(0)


def _jnp_batch(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.fixture(scope='module')
def camera_setup():
    cfg = tiny_config()
    batch = _jnp_batch(make_batch(cfg, n_points=256))
    model = StreamingFlow(cfg)
    args = TR.batch_to_model_args(batch, cfg)
    variables = jax.jit(model.init)(
        {'params': KEY, 'dropout': KEY, 'sample': KEY}, **args)
    return cfg, batch, model, variables


class TestCameraModel:
    def test_forward_shapes(self, camera_setup):
        cfg, batch, model, variables = camera_setup
        args = TR.batch_to_model_args(batch, cfg)
        out = jax.jit(model.apply)(variables, **args, rngs={'sample': KEY})
        T = batch['target_timestamp'].shape[1]
        Xb = int((cfg.LIFT.X_BOUND[1] - cfg.LIFT.X_BOUND[0])
                 / cfg.LIFT.X_BOUND[2])
        assert out['segmentation'].shape == (1, T, Xb, Xb, 2)
        assert out['instance_center'].shape == (1, T, Xb, Xb, 1)
        assert out['instance_offset'].shape == (1, T, Xb, Xb, 2)
        assert out['instance_flow'].shape == (1, T, Xb, Xb, 2)
        D = int(cfg.LIFT.D_BOUND[1] - cfg.LIFT.D_BOUND[0])
        S, N = cfg.TIME_RECEPTIVE_FIELD, len(cfg.IMAGE.NAMES)
        fh = cfg.IMAGE.FINAL_DIM[0] // cfg.MODEL.ENCODER.DOWNSAMPLE
        fw = cfg.IMAGE.FINAL_DIM[1] // cfg.MODEL.ENCODER.DOWNSAMPLE
        assert out['depth_prediction'].shape == (1, S, N, fh, fw, D)
        for k in ('segmentation', 'instance_center', 'depth_prediction'):
            assert np.isfinite(np.asarray(out[k])).all(), k

    def test_instance_center_in_unit_range(self, camera_setup):
        cfg, batch, model, variables = camera_setup
        args = TR.batch_to_model_args(batch, cfg)
        out = jax.jit(model.apply)(variables, **args, rngs={'sample': KEY})
        ic = np.asarray(out['instance_center'])
        assert (ic >= 0).all() and (ic <= 1).all()


class TestTrainStep:
    def test_one_step_reduces_params_finite(self):
        cfg = tiny_config()
        batch = _jnp_batch(make_batch(cfg, n_points=256))
        state = TR.create_train_state(cfg, KEY, batch)
        # snapshot before the step: the train step donates the state buffers
        old_params = jax.tree_util.tree_map(np.asarray, state.params)
        step = TR.make_train_step(cfg)
        state2, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics['total_loss']))
        for name in ('segmentation', 'instance_center', 'instance_offset',
                     'instance_flow', 'depths'):
            assert name in metrics, name
            assert np.isfinite(float(metrics[name])), name
        # parameters actually moved
        diff = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(a - np.asarray(b)).max()), old_params,
            state2.params)
        assert max(jax.tree_util.tree_leaves(diff)) > 0

    def test_label_preparation_shapes(self):
        cfg = tiny_config()
        batch = _jnp_batch(make_batch(cfg, n_points=64))
        labels = TR.prepare_future_labels(batch, cfg)
        T = cfg.TIME_RECEPTIVE_FIELD + cfg.N_FUTURE_FRAMES
        assert labels['segmentation'].shape[1] == T
        assert labels['instance'].ndim == 4
        assert labels['depths'].dtype == jnp.int32
