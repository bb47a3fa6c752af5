"""Dense pillar LiDAR backbone ("pillar8x") — the TPU-first default.

Replaces the gather-heavy sparse path with a dense BEV pipeline that maps
onto the MXU and streams HBM sequentially (SURVEY.md §7 design stance,
option (b): pillarisation at matched receptive field):

  points -> fixed-capacity pillar scatter (segment-sum, like bev_pool)
         -> space-to-depth 4x (1600^2 sparse grid folded to 400^2 dense
            channels — dense full-res convs would waste ~300x the work at
            ~0.3% occupancy)
         -> dense 2D conv stages at 400 -> 200 resolution with the
            spconv8x channel-ladder tail [64, 128]
         -> (B, T, 200, 200, 2*OUTPUT_CHANNELS) BEV features.

Capability-parity notes vs the reference SparseEncoder
(mmdet3d/models/backbones/sparse_encoder.py:11-133): same 8x spatial
downsampling, same stage channel ladder, same output width (256 = 2*128,
standing in for the z-collapse reshape at :126-133).  The z axis enters
through pillar statistics (z mean/min/max + binned occupancy) instead of
3-D convolution; the exact sparse engine remains available as
MODEL.LIDAR.BACKBONE='spconv8x' (models/lidar_encoder.py) for numeric
parity work.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import SparseEncoderConfig


def pillarize(points: jnp.ndarray, point_mask: jnp.ndarray,
              point_cloud_range, voxel_size, n_z_bins: int = 8):
    """points (P, C>=3) -> dense pillar features (nx, ny, F).

    Per-pillar statistics via one segment-sum/max pass (static shapes, no
    sort): count, mean of all point features, mean z offset, max z, and an
    ``n_z_bins`` occupancy histogram over the pillar's z column — the
    information the reference's 3-D conv stack extracts from its 41-deep
    z axis, computed in closed form."""
    pc = jnp.asarray(point_cloud_range, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    nx = int(round(float((point_cloud_range[3] - point_cloud_range[0])
                         / voxel_size[0])))
    ny = int(round(float((point_cloud_range[4] - point_cloud_range[1])
                         / voxel_size[1])))
    z_lo, z_hi = float(point_cloud_range[2]), float(point_cloud_range[5])

    cx = jnp.floor((points[:, 0] - pc[0]) / vs[0]).astype(jnp.int32)
    cy = jnp.floor((points[:, 1] - pc[1]) / vs[1]).astype(jnp.int32)
    inb = ((cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny)
           & (points[:, 2] >= z_lo) & (points[:, 2] < z_hi) & point_mask)
    pid = jnp.where(inb, cx * ny + cy, nx * ny)          # trash bin

    n_pillars = nx * ny
    ones = inb.astype(jnp.float32)
    count = jax.ops.segment_sum(ones, pid, num_segments=n_pillars + 1)
    denom = jnp.maximum(count, 1.0)

    feat_sum = jax.ops.segment_sum(
        jnp.where(inb[:, None], points, 0.0), pid, num_segments=n_pillars + 1)
    feat_mean = feat_sum / denom[:, None]

    z = points[:, 2]
    z_max = jax.ops.segment_max(jnp.where(inb, z, z_lo), pid,
                                num_segments=n_pillars + 1)
    zbin = jnp.clip(((z - z_lo) / (z_hi - z_lo) * n_z_bins).astype(jnp.int32),
                    0, n_z_bins - 1)
    occ_id = jnp.where(inb, pid * n_z_bins + zbin, n_pillars * n_z_bins)
    occ = jax.ops.segment_sum(ones, occ_id,
                              num_segments=n_pillars * n_z_bins + 1)
    occ = jnp.minimum(occ[:n_pillars * n_z_bins].reshape(n_pillars, n_z_bins),
                      1.0)

    feats = jnp.concatenate([
        jnp.log1p(count[:n_pillars, None]),
        feat_mean[:n_pillars],
        z_max[:n_pillars, None],
        occ,
    ], axis=-1)
    feats = jnp.where(count[:n_pillars, None] > 0, feats, 0.0)
    return feats.reshape(nx, ny, -1)


class ConvBNReLU(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1)] * 2, use_bias=False)(x)
        # reference BN eps 1e-3 / momentum 0.01 (sparse_encoder.py:39-40)
        x = nn.BatchNorm(momentum=0.99, epsilon=1e-3,
                         use_running_average=not train)(x)
        return nn.relu(x)


class PillarBEVEncoder(nn.Module):
    """points (B, T, P, 5) -> BEV features (B, T, X/8, Y/8, 2*out_channels)."""
    cfg: SparseEncoderConfig
    n_z_bins: int = 8

    @nn.compact
    def __call__(self, points, train: bool = False):
        cfg = self.cfg
        B, T, P, C = points.shape
        flat = points.reshape(B * T, P, C)
        pmask = jnp.any(flat[..., :3] != 0, axis=-1)

        grid = jax.vmap(lambda p, m: pillarize(
            p, m, cfg.POINT_CLOUD_RANGE, cfg.VOXEL_SIZE, self.n_z_bins))(
            flat, pmask)                                  # (BT, nx, ny, F)

        # compute in bf16: HBM traffic dominates this branch
        h = grid.astype(jnp.bfloat16)

        # Space-to-depth 4x straight out of the pillar grid: at 0.0625 m the
        # active density is ~0.3%, so dense full-res convs would do ~300x
        # the useful work.  Folding 4x4 patches into channels preserves the
        # information losslessly and lands the convs at 400^2 with
        # MXU-friendly channel counts.
        bt, nx, ny, f = h.shape
        s = 4
        h = h.reshape(bt, nx // s, s, ny // s, s, f)
        h = jnp.moveaxis(h, (2, 4), (3, 4)).reshape(
            bt, nx // s, ny // s, s * s * f)

        # two conv stages: 400^2 at stage-3 width, stride into 200^2 at
        # stage-4 width (spconv8x channel ladder tail, sparse_encoder.py:34)
        c3 = cfg.ENCODER_CHANNELS[-2][-1]                 # 64
        c4 = cfg.ENCODER_CHANNELS[-1][-1]                 # 128
        h = ConvBNReLU(c3, name='stage3_conv1')(h, train=train)
        h = ConvBNReLU(c3, name='stage3_conv2')(h, train=train)
        h = ConvBNReLU(c4, stride=2, name='stage4_down')(h, train=train)
        h = ConvBNReLU(c4, name='stage4_conv')(h, train=train)

        h = nn.Conv(2 * cfg.OUTPUT_CHANNELS, (1, 1), use_bias=False,
                    name='conv_out')(h)
        h = nn.BatchNorm(momentum=0.99, epsilon=1e-3,
                         use_running_average=not train)(h)
        h = nn.relu(h).astype(jnp.float32)
        return h.reshape(B, T, *h.shape[1:])
