"""Planning head + cost library tests (reference cost.py / planning_model.py)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import streamingflow_tpu.ops.cost as C
from streamingflow_tpu.data import make_batch, tiny_config


def _grid():
    return C.make_cost_grid([-8.0, 8.0, 0.5], [-8.0, 8.0, 0.5],
                            ego_width=1.85, ego_height=4.084,
                            safety_lambda=1.0)


def test_polygon_fill_square():
    pts = np.array([[0.0, 0.0], [0.0, 3.0], [3.0, 3.0], [3.0, 0.0]])
    cells = C.polygon_fill(pts)
    assert {tuple(c) for c in cells} == {(r, c) for r in range(4)
                                         for c in range(4)}


def test_footprint_nonempty_and_centred():
    g = _grid()
    fp = g.footprint[g.footprint_mask]
    assert len(fp) > 4
    # footprint cells cluster around the ego cell (grid centre)
    centre = np.array(g.bev_dimension) / 2.0
    assert np.all(np.abs(fp - centre) < 12)
    # inflated footprint strictly larger
    assert g.footprint_lam_mask.sum() > g.footprint_mask.sum()


def test_compute_area_matches_naive():
    g = _grid()
    rng = np.random.RandomState(0)
    B, N, T = 1, 3, 2
    H, W = g.bev_dimension
    raster = rng.rand(B, T, H, W).astype(np.float32)
    trajs = rng.uniform(-4, 4, size=(B, N, T, 2)).astype(np.float32)

    ours = np.asarray(C.compute_area(g, jnp.asarray(raster),
                                     jnp.asarray(trajs)))

    # naive restatement of reference cost.py:85-127
    fp = g.footprint[g.footprint_mask]
    expect = np.zeros((B, N, T))
    for b in range(B):
        for n in range(N):
            for t in range(T):
                pr = trajs[b, n, t] / g.dx        # divide then swap
                pr = pr[::-1]
                cells = pr + fp
                rr = np.clip(cells[:, 0].astype(np.int64), 0, H - 1)
                cc = np.clip(cells[:, 1].astype(np.int64), 0, W - 1)
                expect[b, n, t] = raster[b, t, rr, cc].sum()
    np.testing.assert_allclose(ours, expect, rtol=1e-5)


def test_lr_divider_matches_bruteforce():
    g = _grid()
    rng = np.random.RandomState(1)
    B, N, T = 1, 4, 2
    H, W = g.bev_dimension
    lane = np.zeros((B, 1, H, W), np.float32)
    lane[0, 0, 10, 5] = 1.0
    lane[0, 0, 20, 25] = 1.0
    trajs = rng.uniform(-6, 6, size=(B, N, T, 2)).astype(np.float32)

    ours = np.asarray(C.lr_divider_cost(g, jnp.asarray(trajs),
                                        jnp.asarray(lane), factor=1.0,
                                        chunk=64))
    # brute force per reference LR_divider:264-305
    lane_cells = np.argwhere(lane[0, 0] > 0)
    yi = np.clip((trajs[..., 0] - g.bx[0]) / g.dx[0], 0, H - 1).astype(int)
    xi = np.clip((trajs[..., 1] - g.bx[1]) / g.dx[1], 0, W - 1).astype(int)
    expect = np.zeros((B, N, T))
    for n in range(N):
        for t in range(T):
            yx = np.array([yi[0, n, t], xi[0, n, t]], float)
            d = np.sqrt((((yx - lane_cells) * g.dx[::-1]) ** 2).sum(-1)).min()
            expect[0, n, t] = 0.0 if d > 1.0 else (1.0 - d) ** 2
    np.testing.assert_allclose(ours, expect, rtol=1e-4, atol=1e-6)


def test_comfort_cost_straight_line_is_cheap():
    # constant-velocity straight line => zero acc/jerk => zero comfort cost
    T = 6
    straight = np.zeros((1, 1, T, 2), np.float32)
    straight[0, 0, :, 1] = np.arange(1, T + 1) * 1.0   # 2 m/s forward
    out = np.asarray(C.comfort_cost(jnp.asarray(straight), factor=1.0))
    assert out[0, 0] == 0.0

    # erratic trajectory costs more
    rng = np.random.RandomState(0)
    erratic = rng.randn(1, 1, T, 2).astype(np.float32) * 8
    out2 = np.asarray(C.comfort_cost(jnp.asarray(erratic), factor=1.0))
    assert out2[0, 0] > 0.0


def test_progress_cost():
    trajs = np.zeros((1, 2, 3, 2), np.float32)
    trajs[0, 0, :, 1] = [1, 2, 3]      # moves forward
    trajs[0, 1, :, 1] = [0, 0, 0]      # stays
    target = np.array([[0.0, 3.0]], np.float32)
    out = np.asarray(C.progress_cost(jnp.asarray(trajs),
                                     jnp.asarray(target), factor=1.0))
    assert out[0, 0] < out[0, 1]       # reaching the goal is cheaper


def test_select_command_trajs():
    from streamingflow_tpu.models.planning import select_command_trajs
    N, num = 6, 2
    trajs = np.arange(N, dtype=np.float32).reshape(1, N, 1, 1)
    trajs = np.tile(trajs, (3, 1, 2, 3))   # (3, 6, 2, 3)
    cmds = np.array([0, 1, 2], np.int32)
    out = np.asarray(select_command_trajs(jnp.asarray(trajs),
                                          jnp.asarray(cmds), num))
    assert out.shape == trajs.shape
    np.testing.assert_array_equal(np.unique(out[0]), [0, 1])    # LEFT third
    np.testing.assert_array_equal(np.unique(out[1]), [2, 3])    # FORWARD
    np.testing.assert_array_equal(np.unique(out[2]), [4, 5])    # RIGHT


@pytest.fixture(scope='module')
def planning_cfg():
    cfg = tiny_config()
    cfg.PLANNING.ENABLED = True
    cfg.PLANNING.SAMPLE_NUM = 9
    cfg.PLANNING.GRU_STATE_SIZE = 16
    return cfg


def test_planning_module_forward(planning_cfg):
    from streamingflow_tpu.models.planning import Planning
    cfg = planning_cfg
    rng = np.random.RandomState(0)
    B, N, T = 2, cfg.PLANNING.SAMPLE_NUM, cfg.N_FUTURE_FRAMES
    H = W = 32
    mod = Planning(cfg=cfg, feature_channel=16,
                   gru_state_size=cfg.PLANNING.GRU_STATE_SIZE)
    args = dict(
        cam_front=jnp.asarray(rng.rand(B, 8, 16, 16), jnp.float32),
        trajs=jnp.asarray(rng.randn(B, N, T, 3), jnp.float32),
        gt_trajs=jnp.asarray(rng.randn(B, T, 3), jnp.float32),
        cost_volume=jnp.asarray(rng.rand(B, T, H, W), jnp.float32),
        semantic_pred=jnp.asarray(rng.rand(B, T, H, W) > 0.9, jnp.float32),
        hd_map=jnp.asarray(rng.rand(B, 2, H, W) > 0.5, jnp.float32),
        commands=jnp.asarray([0, 2], jnp.int32),
        target_points=jnp.asarray(rng.randn(B, 2), jnp.float32))
    variables = mod.init(jax.random.PRNGKey(0), **args, train=True)
    (loss, traj), _ = mod.apply(variables, **args, train=True,
                                mutable=['batch_stats'])
    assert np.isfinite(float(loss))
    assert traj.shape == (B, T, 3)
    # eval mode returns zero loss
    loss0, traj0 = mod.apply(variables, **args, train=False)
    assert float(loss0) == 0.0 and traj0.shape == (B, T, 3)


@pytest.mark.skipif(os.environ.get('SF_FAST_TESTS') == '1',
                    reason='slow tier (~6 min compile); run without '
                           'SF_FAST_TESTS for the full suite')
def test_train_step_with_planning(planning_cfg):
    """End-to-end: planning loss joins the uncertainty-weighted total."""
    import jax
    from streamingflow_tpu.training import trainer as TR
    cfg = planning_cfg
    batch = {k: jnp.asarray(v)
             for k, v in make_batch(cfg, batch_size=1, n_points=256).items()}
    state = TR.create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = TR.make_train_step(cfg)
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['total_loss']))
    assert 'planning' in metrics
    assert np.isfinite(float(metrics['planning']))
