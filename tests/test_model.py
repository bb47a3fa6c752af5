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


def test_packed_train_step_matches_unpacked():
    """The fused-vector production step (trainer.make_packed_train_step)
    must equal the tree-state step exactly: same loss, same params after
    one clip->wd->adam update, same BN stats.  (The packing exists because
    ~2,300-buffer states cost ~87 s/call of host dispatch on the target
    runtime — docs/PERF.md round-4 notes.)"""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from streamingflow_tpu.data import make_batch, tiny_config
    from streamingflow_tpu.training import trainer as TR

    cfg = tiny_config()
    cfg.MODEL.MODALITY.USE_LIDAR = True
    batch = {k: jnp.asarray(v) for k, v in
             make_batch(cfg, batch_size=1, n_points=128).items()}
    state = TR.create_train_state(cfg, jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(7)

    # pack before the tree step runs: both steps donate their state input
    packed = TR.pack_train_state(state)
    packed_step = TR.make_packed_train_step(cfg, state)

    s1, m1 = TR.make_train_step(cfg)(state, batch, rng)
    p2, m2 = packed_step(packed, batch, rng)
    s2 = TR.unpack_train_state(p2, state)

    np.testing.assert_allclose(float(m1['total_loss']),
                               float(m2['total_loss']), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-7),
        s1.params, s2.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-6),
        s1.batch_stats, s2.batch_stats)
    assert int(s2.step) == int(s1.step)
