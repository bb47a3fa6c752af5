"""Metric and loss semantics on toy inputs (SURVEY §4 golden tests).

Covers IoU accumulation, panoptic quality incl. the temporal-consistency
penalty (reference metrics.py:201-207), planning L2/collision, the
segmentation/regression/depth/probabilistic losses, and the host-side
instance post-processing pipeline."""
import numpy as np
import jax.numpy as jnp
import pytest

from streamingflow_tpu.training import losses as L
from streamingflow_tpu.training.metrics import (IntersectionOverUnion,
                                                PanopticMetric)
from streamingflow_tpu import postprocess as PP


# --------------------------------------------------------------------- IoU
def test_iou_perfect_and_disjoint():
    m = IntersectionOverUnion(n_classes=2)
    pred = np.array([[0, 1], [1, 1]])
    m.update(pred, pred)
    np.testing.assert_allclose(m.compute(), [1.0, 1.0])

    m.reset()
    m.update(np.zeros((4, 4), np.int64), np.ones((4, 4), np.int64))
    np.testing.assert_allclose(m.compute(), [0.0, 0.0])


def test_iou_accumulates_across_updates():
    m = IntersectionOverUnion(n_classes=2)
    a = np.array([1, 1, 0, 0])
    b = np.array([1, 0, 0, 0])
    m.update(a, b)            # class1: tp=1 fp=1 fn=0
    m.update(b, a)            # class1: tp=1 fp=0 fn=1
    # class 1 totals: tp=2, fp=1, fn=1 -> 0.5
    np.testing.assert_allclose(m.compute()[1], 0.5)


def test_iou_state_roundtrip_sums_like_dist_reduce():
    """State arrays sum across workers like Lightning dist_reduce_fx='sum'."""
    m1 = IntersectionOverUnion(2)
    m2 = IntersectionOverUnion(2)
    m1.update(np.array([1, 0]), np.array([1, 1]))
    m2.update(np.array([1, 1]), np.array([1, 0]))
    combined = IntersectionOverUnion(2)
    combined.load_state(m1.state() + m2.state())
    ref = IntersectionOverUnion(2)
    ref.update(np.array([1, 0, 1, 1]), np.array([1, 1, 1, 0]))
    np.testing.assert_allclose(combined.compute(), ref.compute())


# ---------------------------------------------------------------- panoptic
def _square(h, w, r0, c0, size, value):
    img = np.zeros((h, w), np.int64)
    img[r0:r0 + size, c0:c0 + size] = value
    return img


def test_pq_perfect_match():
    gt = _square(20, 20, 2, 2, 6, 1) + _square(20, 20, 12, 12, 5, 2)
    m = PanopticMetric(n_classes=2)
    m.update(gt[None, None], gt[None, None])
    scores = m.compute()
    np.testing.assert_allclose(scores['pq'][1], 1.0)
    np.testing.assert_allclose(scores['sq'][1], 1.0)
    np.testing.assert_allclose(scores['rq'][1], 1.0)


def test_pq_iou_below_half_is_fp_and_fn():
    gt = _square(20, 20, 0, 0, 10, 1)
    pred = _square(20, 20, 8, 8, 10, 1)   # overlap 4/196 < 0.5
    m = PanopticMetric(n_classes=2)
    m.update(pred[None, None], gt[None, None])
    scores = m.compute()
    assert scores['pq'][1] == 0.0


def test_pq_temporal_consistency_penalty():
    """A gt track that switches predicted id mid-sequence is penalised
    (reference metrics.py:201-207) vs one that keeps its id."""
    gt = _square(16, 16, 4, 4, 6, 1)
    consistent = PanopticMetric(n_classes=2)
    consistent.update(np.stack([gt, gt])[None], np.stack([gt, gt])[None])

    switched = PanopticMetric(n_classes=2)
    pred_t1 = _square(16, 16, 4, 4, 6, 2)  # same mask, new id
    switched.update(np.stack([gt, pred_t1])[None], np.stack([gt, gt])[None])
    assert switched.compute()['pq'][1] < consistent.compute()['pq'][1]


# ------------------------------------------------------------------ losses
def test_segmentation_loss_perfect_prediction_is_small():
    tgt = np.random.default_rng(0).integers(0, 2, (2, 3, 8, 8, 1))
    logits = np.where(tgt == 1, 50.0, -50.0)
    logits = np.concatenate([-logits, logits], axis=-1)
    loss = L.segmentation_loss(jnp.asarray(logits), jnp.asarray(tgt),
                               class_weights=[1.0, 2.0], n_present=3)
    assert float(loss) < 1e-5


def test_segmentation_loss_future_discount():
    tgt = np.ones((1, 4, 4, 4, 1), np.int64)
    logits = np.concatenate([np.ones((1, 4, 4, 4, 1)) * 5.0,
                             np.zeros((1, 4, 4, 4, 1))], -1)  # wrong class
    full = L.segmentation_loss(jnp.asarray(logits), jnp.asarray(tgt),
                               [1.0, 1.0], n_present=4, future_discount=0.5)
    disc = L.segmentation_loss(jnp.asarray(logits), jnp.asarray(tgt),
                               [1.0, 1.0], n_present=1, future_discount=0.5)
    assert float(disc) < float(full)


def test_segmentation_loss_top_k_selects_hard_pixels():
    tgt = np.zeros((1, 1, 4, 4, 1), np.int64)
    logits = np.zeros((1, 1, 4, 4, 2))
    logits[..., 0] = 10.0          # all correct, easy
    logits[0, 0, 0, 0] = [-10, 10]  # one hard pixel
    lo = L.segmentation_loss(jnp.asarray(logits), jnp.asarray(tgt), [1., 1.],
                             n_present=1, use_top_k=True, top_k_ratio=1 / 16)
    hi = L.segmentation_loss(jnp.asarray(logits), jnp.asarray(tgt), [1., 1.],
                             n_present=1)
    # hard-pixel mining concentrates on the wrong pixel -> larger mean
    assert float(lo) > float(hi)


def test_spatial_regression_ignore_index():
    tgt = np.full((1, 2, 4, 4, 2), 255.0)
    pred = np.zeros((1, 2, 4, 4, 2))
    loss = L.spatial_regression_loss(jnp.asarray(pred), jnp.asarray(tgt),
                                     norm=1, n_present=2, ignore_index=255)
    assert float(loss) == 0.0


def test_spatial_regression_l1_l2():
    tgt = np.zeros((1, 1, 2, 2, 1))
    pred = np.full((1, 1, 2, 2, 1), 2.0)
    l1 = L.spatial_regression_loss(jnp.asarray(pred), jnp.asarray(tgt), 1,
                                   n_present=1)
    l2 = L.spatial_regression_loss(jnp.asarray(pred), jnp.asarray(tgt), 2,
                                   n_present=1)
    np.testing.assert_allclose(float(l1), 2.0, rtol=1e-6)
    np.testing.assert_allclose(float(l2), 4.0, rtol=1e-6)


def test_depth_loss_matches_manual_ce():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(1, 1, 2, 4, 4, 8)).astype(np.float32)
    tgt = rng.integers(0, 8, (1, 1, 2, 4, 4))
    loss = float(L.depth_loss(jnp.asarray(logits), jnp.asarray(tgt)))
    p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    nll = -np.log(np.take_along_axis(p, tgt[..., None], -1)[..., 0])
    np.testing.assert_allclose(loss, nll.mean(), rtol=1e-4)


def test_probabilistic_kl_zero_for_identical():
    mu = jnp.zeros((2, 8))
    ls = jnp.zeros((2, 8))
    kl = L.probabilistic_loss(mu, ls, mu, ls)
    np.testing.assert_allclose(float(kl), 0.0, atol=1e-6)


# ------------------------------------------------------ instance postproc
def test_find_instance_centers_nms():
    heat = np.zeros((16, 16), np.float32)
    heat[4, 4] = 0.9
    heat[4, 5] = 0.7       # suppressed by the 3x3 NMS
    heat[10, 12] = 0.8
    centers = PP.instance.find_instance_centers(heat, conf_threshold=0.1)
    assert sorted(map(tuple, centers)) == [(4, 4), (10, 12)]


def test_group_pixels_nearest_center():
    centers = np.array([[2, 2], [2, 12]])
    ids = PP.instance.group_pixels(centers, np.zeros((8, 16, 2), np.float32))
    assert ids[2, 2] == 1 and ids[2, 12] == 2
    assert ids[2, 5] == 1 and ids[2, 10] == 2


def test_full_instance_pipeline_consistent_ids():
    """A single square moving right keeps one id across time."""
    T, H, W = 3, 32, 32
    seg_logit = np.zeros((1, T, H, W, 2), np.float32)
    center = np.zeros((1, T, H, W, 1), np.float32)
    offset = np.zeros((1, T, H, W, 2), np.float32)
    flow = np.zeros((1, T, H, W, 2), np.float32)
    for t in range(T):
        c0 = 8 + 2 * t
        seg_logit[0, t, 10:16, c0:c0 + 6, 1] = 10.0
        seg_logit[0, t, :, :, 0] = 1.0
        center[0, t, 13, c0 + 3, 0] = 1.0
        for r in range(10, 16):
            for c in range(c0, c0 + 6):
                offset[0, t, r, c] = [13 - r, c0 + 3 - c]
        flow[0, t, :, :, 1] = 2.0  # rightward motion
    out = {'segmentation': seg_logit, 'instance_center': center,
           'instance_offset': offset, 'instance_flow': flow}
    consistent = PP.predict_instance_segmentation_and_trajectories(out)
    ids = [np.unique(consistent[0, t])[1:] for t in range(T)]
    assert all(len(i) == 1 for i in ids)
    assert ids[0][0] == ids[1][0] == ids[2][0]


def test_short_interval_variant_matches_without_flow():
    """_short_interval: no flow warp, 10 px threshold (instance.py:272-368)."""
    T, H, W = 2, 24, 24
    seg_logit = np.zeros((1, T, H, W, 2), np.float32)
    center = np.zeros((1, T, H, W, 1), np.float32)
    offset = np.zeros((1, T, H, W, 2), np.float32)
    for t in range(T):
        c0 = 6 + 4 * t     # 4 px jump: > 3 (long threshold), < 10 (short)
        seg_logit[0, t, 6:12, c0:c0 + 6, 1] = 10.0
        center[0, t, 9, c0 + 3, 0] = 1.0
        for r in range(6, 12):
            for c in range(c0, c0 + 6):
                offset[0, t, r, c] = [9 - r, c0 + 3 - c]
    out = {'segmentation': seg_logit, 'instance_center': center,
           'instance_offset': offset}
    short = PP.predict_instance_segmentation_and_trajectories(
        out, short_interval=True)
    assert (np.unique(short[0, 0])[1:] == np.unique(short[0, 1])[1:]).all()
