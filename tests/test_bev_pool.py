import jax.numpy as jnp
import numpy as np
import pytest

from streamingflow_tpu import geometry as G
import streamingflow_tpu.ops.lift_splat as BP


def naive_pool(x, geom, start, res, dim):
    """Literal numpy restatement of reference streamingflow.py:341-374."""
    nx, ny, nz = dim
    coords = np.trunc((geom - (start - res / 2.0)) / res).astype(np.int64)
    out = np.zeros((nx, ny, x.shape[-1]), np.float64)
    for p in range(x.shape[0]):
        cx, cy, cz = coords[p]
        if 0 <= cx < nx and 0 <= cy < ny and 0 <= cz < nz:
            out[cx, cy] += x[p]
    return out


@pytest.fixture
def bev_setup():
    res, start, dim = G.calculate_birds_eye_view_parameters(
        [-10., 10., 1.], [-10., 10., 1.], [-5., 5., 10.])
    return res, start, dim


@pytest.mark.parametrize('backend', ['scatter', 'sorted'])
def test_bev_pool_matches_naive(bev_setup, backend):
    res, start, dim = bev_setup
    rng = np.random.RandomState(0)
    n = 512
    geom = rng.uniform(-12, 12, size=(n, 3)).astype(np.float32)
    geom[:, 2] = rng.uniform(-4, 4, size=n)
    x = rng.randn(n, 8).astype(np.float32)

    ours = np.asarray(BP.bev_pool(jnp.asarray(x), jnp.asarray(geom),
                                  start, res, dim, backend=backend))
    ref = naive_pool(x, geom, start, res, dim)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_bev_pool_truncation_semantics(bev_setup):
    """torch .long() truncates toward zero: a point just below the grid start
    offset must land in bin 0, exactly like the reference."""
    res, start, dim = bev_setup
    geom = np.array([[start[0] - 0.49 * res[0], start[1], 0.0]], np.float32)
    x = np.ones((1, 2), np.float32)
    out = np.asarray(BP.bev_pool(jnp.asarray(x), jnp.asarray(geom),
                                 start, res, dim))
    assert out[0, 0].sum() == 2.0  # trunc(-0.49...) == 0 -> kept in bin 0


def test_warp_geometry_identity_for_present():
    geom = np.random.RandomState(1).randn(2, 3, 1, 2, 2, 2, 3).astype(np.float32)
    ego = np.zeros((2, 3, 6), np.float32)
    ego[:, :, 0] = 1.0  # forward motion each step
    mats = G.pose_vec2mat(jnp.asarray(ego))
    out = np.asarray(BP.warp_geometry_to_present(jnp.asarray(geom), mats))
    # present frame (last) is untouched
    np.testing.assert_allclose(out[:, -1], geom[:, -1], atol=1e-6)
    # frame S-2 moved by exactly one step
    np.testing.assert_allclose(out[:, 1, ..., 0], geom[:, 1, ..., 0] + 1.0,
                               atol=1e-5)
    # frame 0 moved by two steps
    np.testing.assert_allclose(out[:, 0, ..., 0], geom[:, 0, ..., 0] + 2.0,
                               atol=1e-5)


def test_projection_discount_accumulation(bev_setup):
    res, start, dim = bev_setup
    rng = np.random.RandomState(2)
    B, S, N, D, H, W, C = 1, 3, 1, 2, 2, 2, 4
    x = rng.rand(B, S, N, D, H, W, C).astype(np.float32)
    geom = rng.uniform(-8, 8, size=(B, S, N, D, H, W, 3)).astype(np.float32)
    geom[..., 2] = 0.0
    ego = np.zeros((B, S, 6), np.float32)
    mats = G.pose_vec2mat(jnp.asarray(ego))

    out = np.asarray(BP.projection_to_birds_eye_view(
        jnp.asarray(x), jnp.asarray(geom), mats, start, res, dim,
        discount=0.5))
    assert out.shape == (B, S, dim[0], dim[1], C)

    # manual accumulation
    frames = [naive_pool(x[0, t].reshape(-1, C), geom[0, t].reshape(-1, 3),
                         start, res, dim) for t in range(S)]
    acc = np.zeros_like(frames[0])
    for t in range(S):
        acc = acc * 0.5 + frames[t]
        np.testing.assert_allclose(out[0, t], acc, rtol=1e-5, atol=1e-4)
