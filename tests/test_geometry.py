"""Golden tests for geometry: JAX implementations vs torch-CPU reference ops.

The torch formulas here re-state the *public* semantics of
torch.nn.functional affine_grid/grid_sample and the pose math of the
reference (utils/geometry.py); parity is required for bit-exact label
warping (BASELINE.md).
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from streamingflow_tpu import geometry as G


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


class TestPoseMath:
    def test_pose_vec2mat_roundtrip(self):
        vec = _rand(5, 6) * 0.3
        mat = np.asarray(G.pose_vec2mat(jnp.asarray(vec)))
        assert mat.shape == (5, 4, 4)
        np.testing.assert_allclose(mat[:, 3], [[0, 0, 0, 1]] * 5, atol=1e-6)
        back = np.asarray(G.mat2pose_vec(jnp.asarray(mat)))
        np.testing.assert_allclose(back, vec, atol=1e-5)

    def test_invert_pose_matrix(self):
        vec = _rand(4, 6) * 0.3
        mat = G.pose_vec2mat(jnp.asarray(vec))
        inv = G.invert_pose_matrix(mat)
        prod = np.asarray(mat) @ np.asarray(inv)
        np.testing.assert_allclose(prod, np.tile(np.eye(4), (4, 1, 1)),
                                   atol=1e-5)

    def test_euler2mat_vs_torch_composition(self):
        # identical composition to reference utils/geometry.py:124-155
        ang = _rand(3, 3) * 0.5
        out = np.asarray(G.euler2mat(jnp.asarray(ang)))
        for i, (x, y, z) in enumerate(ang):
            cz, sz = np.cos(z), np.sin(z)
            cy, sy = np.cos(y), np.sin(y)
            cx, sx = np.cos(x), np.sin(x)
            zmat = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
            ymat = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
            xmat = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
            np.testing.assert_allclose(out[i], xmat @ ymat @ zmat, atol=1e-6)


class TestWarp:
    @pytest.mark.parametrize('mode', ['nearest', 'bilinear'])
    def test_affine_warp_matches_torch_grid_sample(self, mode):
        x = _rand(2, 16, 20, 3)
        theta = np.array([
            [[0.9, -0.1, 0.05], [0.1, 0.9, -0.02]],
            [[1.0, 0.0, 0.3], [0.0, 1.0, -0.3]],
        ], dtype=np.float32)

        ours = np.asarray(G.affine_warp(jnp.asarray(x), jnp.asarray(theta),
                                        mode=mode))

        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        grid = F.affine_grid(torch.from_numpy(theta), size=tx.shape,
                             align_corners=False)
        ref = F.grid_sample(tx, grid, mode=mode, padding_mode='zeros',
                            align_corners=False)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    @pytest.mark.parametrize('mode', ['nearest', 'bilinear'])
    def test_warp_features_against_reference_formula(self, mode):
        # reference utils/geometry.py:196-238
        x = _rand(2, 24, 24, 4)
        flow = (_rand(2, 6) * 0.4).astype(np.float32)
        extent = (50.0, 50.0)
        ours = np.asarray(G.warp_features(jnp.asarray(x), jnp.asarray(flow),
                                          mode=mode, spatial_extent=extent))

        angle = flow[:, 5]
        tr = flow[:, :2].copy()
        tr[:, 0] = -tr[:, 0] / extent[0]
        tr[:, 1] = tr[:, 1] / extent[1]
        cos_t, sin_t = np.cos(angle), np.sin(angle)
        theta = np.stack([
            np.stack([cos_t, -sin_t, tr[:, 1]], -1),
            np.stack([sin_t, cos_t, tr[:, 0]], -1)], 1).astype(np.float32)
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        grid = F.affine_grid(torch.from_numpy(theta), size=tx.shape,
                             align_corners=False)
        ref = F.grid_sample(tx, grid, mode=mode, padding_mode='zeros',
                            align_corners=False).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_cumulative_warp_features_identity_flow(self):
        x = _rand(1, 3, 16, 16, 2)
        flow = np.zeros((1, 3, 6), np.float32)
        out = np.asarray(G.cumulative_warp_features(
            jnp.asarray(x), jnp.asarray(flow), mode='bilinear',
            spatial_extent=(50., 50.)))
        np.testing.assert_allclose(out, x, atol=1e-5)

    def test_cumulative_warp_reverse_shifts(self):
        # translation along x only; check features move consistently
        x = np.zeros((1, 2, 32, 32, 1), np.float32)
        x[0, 1, 16, 16, 0] = 1.0
        flow = np.zeros((1, 2, 6), np.float32)
        flow[0, 0, 0] = 3.125  # 1 pixel at extent 50 on 32 px grid
        out = np.asarray(G.cumulative_warp_features_reverse(
            jnp.asarray(x), jnp.asarray(flow), mode='nearest',
            spatial_extent=(50., 50.)))
        # frame 0 untouched
        np.testing.assert_allclose(out[0, 0], x[0, 0])
        assert out[0, 1].sum() == 1.0
        (ys, xs, _) = np.nonzero(out[0, 1])
        assert (ys[0], xs[0]) != (16, 16)


class TestFrustum:
    def test_create_frustum_shape_and_values(self):
        f = G.create_frustum((224, 480), 8, (2.0, 50.0, 1.0))
        assert f.shape == (48, 28, 60, 3)
        assert f[0, 0, 0, 2] == 2.0
        assert f[-1, 0, 0, 2] == 49.0
        assert f[0, 0, -1, 0] == 479.0
        assert f[0, -1, 0, 1] == 223.0

    def test_get_geometry_pinhole_roundtrip(self):
        # a point at pixel (u,v) with depth d must land at K^-1 [u d, v d, d]
        f = G.create_frustum((32, 32), 8, (2.0, 6.0, 1.0))
        K = np.array([[20., 0, 16.], [0, 20., 16.], [0, 0, 1]], np.float32)
        E = np.eye(4, dtype=np.float32)
        pts = np.asarray(G.get_geometry(
            jnp.asarray(f), jnp.asarray(K)[None, None],
            jnp.asarray(E)[None, None]))
        d, v, u = 2, 1, 3
        expect = np.linalg.inv(K) @ np.array(
            [f[d, v, u, 0] * f[d, v, u, 2], f[d, v, u, 1] * f[d, v, u, 2],
             f[d, v, u, 2]])
        np.testing.assert_allclose(pts[0, 0, d, v, u], expect, atol=1e-5)


class TestBEVParams:
    def test_parameters(self):
        res, start, dim = G.calculate_birds_eye_view_parameters(
            [-50., 50., 0.5], [-50., 50., 0.5], [-10., 10., 20.])
        np.testing.assert_allclose(res, [0.5, 0.5, 20.])
        np.testing.assert_allclose(start, [-49.75, -49.75, 0.])
        np.testing.assert_allclose(dim, [200, 200, 1])
