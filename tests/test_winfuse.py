"""Fused window-gather Pallas subm conv (ops/pallas_winfuse.py) vs the
gather-GEMM engine — values and gradients, interpret mode on CPU.

The kernel must be a drop-in for subm_conv_columns: same active-site
semantics, same tap/band layout, whole-block residual for window-overflow
blocks, and a custom VJP that routes backward through the XLA 'sep'
formulation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from streamingflow_tpu.ops import pallas_winfuse as WF
from streamingflow_tpu.ops import sparse as S
from streamingflow_tpu.ops import sparse_columns as SC

from test_sparse_columns import _make_set, _to_columns

SHAPE = (16, 12, 9)


def _geo(cs):
    cmap = SC.build_column_map(cs, SHAPE[:2])
    return cmap


@pytest.mark.parametrize('column_heavy', [False, True])
@pytest.mark.parametrize('block,window,resid', [
    (16, 64, 4),    # wide window: no overflow, residual path idle
    (16, 32, 64),   # tight window: overflow, residual path exact
])
def test_winfuse_matches_gather_engine(column_heavy, block, window, resid):
    rng = np.random.default_rng(11)
    st = _make_set(rng, SHAPE, 300, 512, column_heavy=column_heavy)
    w = jnp.asarray(rng.normal(size=(27, 8, 12)).astype(np.float32)) * 0.3
    b = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))
    ref = S.subm_conv3d(st, w, bias=b).feats

    cs = _to_columns(st, cap_cols=256)
    cmap = _geo(cs)
    plan = WF.build_fused_plan(cmap, cs.col_mask, block=block,
                               window=window, resid_blocks=resid)
    assert int(plan.n_dropped) == 0
    out = WF.subm_conv_winfuse(cs.feats, cs.zmask, cmap, plan, w, bias=b,
                               window=window, interpret=True)
    got = SC.to_sites(cs._replace(feats=out), st.ids, st.mask, SHAPE[2], 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_winfuse_gradients_match_sep_formulation():
    """custom VJP == autodiff of the XLA 'sep' path, for both feats and
    weights (the fused conv is linear in each)."""
    rng = np.random.default_rng(5)
    st = _make_set(rng, SHAPE, 200, 256, column_heavy=True)
    w = jnp.asarray(rng.normal(size=(27, 8, 8)).astype(np.float32)) * 0.3
    cs = _to_columns(st, cap_cols=128)
    cmap = _geo(cs)
    plan = WF.build_fused_plan(cmap, cs.col_mask, block=16, window=64,
                               resid_blocks=4)
    cot = jnp.asarray(rng.normal(
        size=(cs.feats.shape[0], SHAPE[2] * 8)).astype(np.float32))

    def loss_fused(f, w):
        out = WF.subm_conv_winfuse(f, cs.zmask, cmap, plan, w,
                                   mask_output=False, window=64,
                                   interpret=True)
        return jnp.sum(out * cot)

    def loss_sep(f, w):
        out = SC.subm_conv_columns(f, cs.zmask, cmap, w,
                                   formulation='sep', mask_output=False)
        return jnp.sum(out * cot)

    gf1, gw1 = jax.grad(loss_fused, argnums=(0, 1))(cs.feats, w)
    gf2, gw2 = jax.grad(loss_sep, argnums=(0, 1))(cs.feats, w)
    np.testing.assert_allclose(np.asarray(gf1), np.asarray(gf2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=1e-5, atol=1e-5)


def test_winfuse_ladder_matches_sep_ladder():
    """Full micro spconv8x forward through the model with
    Z_FORMULATION='winfuse' equals the 'sep' ladder (engine agreement at
    the LidarBEVEncoder level, interpret-mode kernel)."""
    from streamingflow_tpu.config import Config
    from streamingflow_tpu.models.lidar_encoder import LidarBEVEncoder

    def run(form):
        cfg = Config().MODEL.SPARSE_ENCODER
        cfg.POINT_CLOUD_RANGE = [-4.0, -4.0, -4.0, 4.0, 4.0, 3.68]
        cfg.VOXEL_SIZE = [0.25, 0.25, 0.32]
        cfg.SPARSE_SHAPE = (32, 32, 25)
        cfg.MAX_VOXELS = 512
        cfg.STAGE_CAPS = [512, 256, 128, 64]
        cfg.COLUMN_CAPS = [256, 128, 64, 64]
        cfg.ENGINE = 'column'
        cfg.Z_FORMULATION = form
        cfg.WINDOW_BLOCK = 16
        cfg.WINFUSE_WINDOW = 64
        cfg.DENSE_TAIL_FROM_STAGE = 3
        model = LidarBEVEncoder(cfg)
        rng = np.random.default_rng(0)
        pts = rng.uniform(-4, 4, size=(1, 2, 256, 5)).astype(np.float32)
        pts[..., 2] = rng.uniform(-4, 3.5, size=(1, 2, 256))
        v = model.init({'params': jax.random.PRNGKey(0)}, jnp.asarray(pts))
        return model.apply(v, jnp.asarray(pts)), v

    out_f, v_f = run('winfuse')
    out_s, v_s = run('sep')
    chex_equal = jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b),
                              v_f['params'], v_s['params'])
    del chex_equal
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                               rtol=2e-5, atol=2e-5)
