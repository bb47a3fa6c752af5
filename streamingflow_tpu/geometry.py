"""Geometry utilities: BEV parameters, 6-DoF pose math, and feature warping.

JAX re-implementation of reference streamingflow/utils/geometry.py.  The
warps reproduce torch's ``affine_grid`` + ``grid_sample`` semantics with
``align_corners=False`` and zero padding so that label warping matches the
reference bit-for-bit at fp32 (required by BASELINE.md).

Array layout convention: feature maps are channels-last (B, H, W, C) — the
TPU-native layout — unlike the reference's NCHW.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------- BEV
def calculate_birds_eye_view_parameters(x_bounds, y_bounds, z_bounds):
    """Resolution / start position / dimension of the BEV grid.

    Reference: utils/geometry.py:40-59.
    Returns numpy arrays (static, used for shapes at trace time).
    """
    bev_resolution = np.array([row[2] for row in [x_bounds, y_bounds, z_bounds]],
                              dtype=np.float32)
    bev_start_position = np.array(
        [row[0] + row[2] / 2.0 for row in [x_bounds, y_bounds, z_bounds]],
        dtype=np.float32)
    bev_dimension = np.array(
        [(row[1] - row[0]) / row[2] for row in [x_bounds, y_bounds, z_bounds]],
        dtype=np.int64)
    return bev_resolution, bev_start_position, bev_dimension


def update_intrinsics(intrinsics, top_crop=0.0, left_crop=0.0,
                      scale_width=1.0, scale_height=1.0):
    """Adjust a (..., 3, 3) intrinsics matrix for resize + crop.

    Reference: utils/geometry.py:16-37."""
    intrinsics = np.array(intrinsics, dtype=np.float32, copy=True)
    intrinsics[..., 0, 0] *= scale_width
    intrinsics[..., 0, 2] *= scale_width
    intrinsics[..., 1, 1] *= scale_height
    intrinsics[..., 1, 2] *= scale_height
    intrinsics[..., 0, 2] -= left_crop
    intrinsics[..., 1, 2] -= top_crop
    return intrinsics


# --------------------------------------------------------------------- pose math
def mat2pose_vec(matrix: jnp.ndarray) -> jnp.ndarray:
    """4x4 pose matrix -> 6-DoF vector (tx, ty, tz, rx, ry, rz).

    Reference: utils/geometry.py:97-121."""
    rotx = jnp.arctan2(-matrix[..., 1, 2], matrix[..., 2, 2])
    cosy = jnp.sqrt(matrix[..., 1, 2] ** 2 + matrix[..., 2, 2] ** 2)
    roty = jnp.arctan2(matrix[..., 0, 2], cosy)
    rotz = jnp.arctan2(-matrix[..., 0, 1], matrix[..., 0, 0])
    rotation = jnp.stack((rotx, roty, rotz), axis=-1)
    translation = matrix[..., :3, 3]
    return jnp.concatenate((translation, rotation), axis=-1)


def euler2mat(angle: jnp.ndarray) -> jnp.ndarray:
    """Euler angles (..., 3) -> rotation matrices (..., 3, 3).

    Composition order matches reference utils/geometry.py:124-155 (x @ y @ z)."""
    x, y, z = angle[..., 0], angle[..., 1], angle[..., 2]
    cosz, sinz = jnp.cos(z), jnp.sin(z)
    cosy, siny = jnp.cos(y), jnp.sin(y)
    cosx, sinx = jnp.cos(x), jnp.sin(x)
    zeros = jnp.zeros_like(z)
    ones = jnp.ones_like(z)

    zmat = jnp.stack([cosz, -sinz, zeros,
                      sinz, cosz, zeros,
                      zeros, zeros, ones], axis=-1).reshape(*z.shape, 3, 3)
    ymat = jnp.stack([cosy, zeros, siny,
                      zeros, ones, zeros,
                      -siny, zeros, cosy], axis=-1).reshape(*z.shape, 3, 3)
    xmat = jnp.stack([ones, zeros, zeros,
                      zeros, cosx, -sinx,
                      zeros, sinx, cosx], axis=-1).reshape(*z.shape, 3, 3)
    hi = jax.lax.Precision.HIGHEST
    return jnp.matmul(jnp.matmul(xmat, ymat, precision=hi), zmat, precision=hi)


def pose_vec2mat(vec: jnp.ndarray) -> jnp.ndarray:
    """6-DoF vector (..., 6) -> (..., 4, 4) transformation matrix.

    Reference: utils/geometry.py:158-172."""
    translation = vec[..., :3, None]
    rot_mat = euler2mat(vec[..., 3:])
    transform = jnp.concatenate([rot_mat, translation], axis=-1)  # (..., 3, 4)
    bottom = jnp.zeros_like(transform[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([transform, bottom], axis=-2)


def invert_pose_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """Invert (..., 4, 4) rigid pose matrices. Reference: utils/geometry.py:175-193."""
    rot_t = jnp.swapaxes(x[..., :3, :3], -1, -2)
    t = x[..., :3, 3:]
    top = jnp.concatenate([rot_t, -jnp.matmul(rot_t, t, precision=jax.lax.Precision.HIGHEST)], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


# ------------------------------------------------------------------------ warps
def _grid_sample_2d(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray,
                    mode: str) -> jnp.ndarray:
    """Sample (H, W, C) image at float pixel coords (h', w') with zero padding.

    Matches torch grid_sample(align_corners=False, padding_mode='zeros').
    """
    H, W, _ = img.shape

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        vals = img[yc, xc]
        return jnp.where(valid[..., None], vals, 0.0)

    if mode == 'nearest':
        # torch rounds with nearbyint (half-to-even); jnp.rint matches.
        xi = jnp.rint(ix).astype(jnp.int32)
        yi = jnp.rint(iy).astype(jnp.int32)
        return gather(yi, xi)
    elif mode == 'bilinear':
        x0 = jnp.floor(ix).astype(jnp.int32)
        y0 = jnp.floor(iy).astype(jnp.int32)
        x1, y1 = x0 + 1, y0 + 1
        wx1 = ix - x0
        wy1 = iy - y0
        wx0 = 1.0 - wx1
        wy0 = 1.0 - wy1
        out = (gather(y0, x0) * (wy0 * wx0)[..., None]
               + gather(y0, x1) * (wy0 * wx1)[..., None]
               + gather(y1, x0) * (wy1 * wx0)[..., None]
               + gather(y1, x1) * (wy1 * wx1)[..., None])
        return out
    raise ValueError(f'Unknown mode {mode}')


def affine_warp(x: jnp.ndarray, theta: jnp.ndarray, mode: str = 'nearest'
                ) -> jnp.ndarray:
    """Warp (B, H, W, C) by per-batch 2x3 affine `theta` in normalized coords.

    Equivalent to torch affine_grid(theta, align_corners=False) + grid_sample.
    """
    B, H, W, C = x.shape
    # Normalised output grid, align_corners=False convention.  Built exactly
    # like torch affine_grid: linspace(-1, 1, n) * ((n - 1) / n), so fp
    # rounding (and hence nearest-mode ties) matches bit-for-bit.
    xs = jnp.linspace(-1.0, 1.0, W, dtype=jnp.float32) * ((W - 1) / W)
    ys = jnp.linspace(-1.0, 1.0, H, dtype=jnp.float32) * ((H - 1) / H)
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1)  # (H, W, 3)

    def warp_one(img, th):
        sample = jnp.matmul(base, th.T,
                            precision=jax.lax.Precision.HIGHEST)
        sx, sy = sample[..., 0], sample[..., 1]
        ix = ((sx + 1.0) * W - 1.0) / 2.0
        iy = ((sy + 1.0) * H - 1.0) / 2.0
        return _grid_sample_2d(img, ix, iy, mode)

    return jax.vmap(warp_one)(x, theta)


def warp_features(x: jnp.ndarray, flow: jnp.ndarray, mode: str = 'nearest',
                  spatial_extent=None) -> jnp.ndarray:
    """Apply an in-plane rotation + translation given by a 6-DoF flow vector.

    x: (B, H, W, C) feature map (channels-last), flow: (B, 6).
    Reference: utils/geometry.py:196-238."""
    if flow is None:
        return x
    angle = flow[:, 5]
    tx = -flow[:, 0] / spatial_extent[0]
    ty = flow[:, 1] / spatial_extent[1]
    cos_t, sin_t = jnp.cos(angle), jnp.sin(angle)
    # theta rows: [cos, -sin, ty], [sin, cos, tx]  (reference: geometry.py:228-229)
    theta = jnp.stack([
        jnp.stack([cos_t, -sin_t, ty], axis=-1),
        jnp.stack([sin_t, cos_t, tx], axis=-1),
    ], axis=1).astype(x.dtype)  # (B, 2, 3)
    return affine_warp(x, theta, mode=mode)


def cumulative_warp_features(x: jnp.ndarray, flow: jnp.ndarray,
                             mode: str = 'nearest', spatial_extent=None
                             ) -> jnp.ndarray:
    """Warp past frames into the present frame by accumulating egomotion.

    x: (B, T, H, W, C); flow: (B, T, 6), pose from t to t+1.
    x[:, -1] unchanged; x[:, t] warped by flow[t] @ ... @ flow[T-2].
    Reference: utils/geometry.py:241-269."""
    T = x.shape[1]
    if T == 1:
        return x
    mats = pose_vec2mat(flow)
    out = [x[:, -1]]
    cum = mats[:, -2]
    for t in reversed(range(T - 1)):
        out.append(warp_features(x[:, t], mat2pose_vec(cum), mode=mode,
                                 spatial_extent=spatial_extent))
        cum = jnp.matmul(mats[:, t - 1], cum, precision=jax.lax.Precision.HIGHEST)
    return jnp.stack(out[::-1], axis=1)


def cumulative_warp_features_reverse(x: jnp.ndarray, flow: jnp.ndarray,
                                     mode: str = 'nearest', spatial_extent=None
                                     ) -> jnp.ndarray:
    """Warp future frames back into the first (present) frame.

    Reference: utils/geometry.py:272-296."""
    mats = pose_vec2mat(flow)
    out = [x[:, 0]]
    cum = None
    for i in range(1, x.shape[1]):
        inv = invert_pose_matrix(mats[:, i - 1])
        cum = inv if cum is None else jnp.matmul(cum, inv, precision=jax.lax.Precision.HIGHEST)
        out.append(warp_features(x[:, i], mat2pose_vec(cum), mode=mode,
                                 spatial_extent=spatial_extent))
    return jnp.stack(out, axis=1)


# --------------------------------------------------------------------- frustum
def create_frustum(final_dim, downsample: int, d_bound) -> np.ndarray:
    """Image-plane frustum grid (D, fH, fW, 3): (x_px, y_px, depth_m).

    Reference: models/streamingflow.py:149-168."""
    h, w = final_dim
    fh, fw = h // downsample, w // downsample
    depth_grid = np.arange(*d_bound, dtype=np.float32)
    D = depth_grid.shape[0]
    x_grid = np.linspace(0, w - 1, fw, dtype=np.float32)
    y_grid = np.linspace(0, h - 1, fh, dtype=np.float32)
    frustum = np.zeros((D, fh, fw, 3), dtype=np.float32)
    frustum[..., 0] = x_grid[None, None, :]
    frustum[..., 1] = y_grid[None, :, None]
    frustum[..., 2] = depth_grid[:, None, None]
    return frustum


def get_geometry(frustum: jnp.ndarray, intrinsics: jnp.ndarray,
                 extrinsics: jnp.ndarray) -> jnp.ndarray:
    """Lift the frustum to 3-D ego-frame points.

    frustum: (D, fH, fW, 3); intrinsics/extrinsics: (B, N, 3, 3)/(B, N, 4, 4).
    Returns (B, N, D, fH, fW, 3). Reference: models/streamingflow.py:277-292."""
    rotation = extrinsics[..., :3, :3]
    translation = extrinsics[..., :3, 3]
    # (u*d, v*d, d) homogeneous-scaled image points
    points = jnp.concatenate(
        [frustum[..., :2] * frustum[..., 2:3], frustum[..., 2:3]], axis=-1)
    hi = jax.lax.Precision.HIGHEST
    combined = jnp.matmul(rotation, jnp.linalg.inv(intrinsics), precision=hi)
    pts = jnp.einsum('bnij,dhwj->bndhwi', combined, points, precision=hi)
    return pts + translation[:, :, None, None, None, :]
