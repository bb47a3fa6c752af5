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

import functools
import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import SparseEncoderConfig


@functools.lru_cache(maxsize=None)
def _pillar_finalize(c: int):
    """Derived-statistics epilogue on raw per-pillar sums, laid out
    (channels, bins).  Cached so repeated pillarize calls share one jit
    cache entry for the binning kernel."""
    def fin(acc):
        count = acc[0:1]
        denom = jnp.maximum(count, 1.0)
        mean = acc[1:1 + c] / denom
        z_mean = mean[2:3]
        z_var = jnp.maximum(acc[1 + c:2 + c] / denom - z_mean * z_mean, 0.0)
        occ = jnp.minimum(acc[2 + c:], 1.0)
        out = jnp.concatenate(
            [jnp.log1p(count), mean, jnp.sqrt(z_var), occ], axis=0)
        return jnp.where(count > 0, out, 0.0)
    return fin


def pillarize(points: jnp.ndarray, point_mask: jnp.ndarray,
              point_cloud_range, voxel_size, n_z_bins: int = 8,
              out_dtype=jnp.float32, presorted: bool = False,
              layout: str = 'bev'):
    """points (P, C>=3) -> dense pillar features (nx, ny, F), or (F, nx, ny)
    with ``layout='cf'`` (channel-first — the binning kernel's native
    layout; the (·, F) relayout wastes 7/8 of each lane tile at F~16 and
    costs ~17 ms on the 1600^2 grid, so hot callers should take 'cf' and
    transpose after folding channels up, e.g. space-to-depth).

    Per-pillar statistics — count, mean of all point features, z spread, and
    an ``n_z_bins`` occupancy histogram over the pillar's z column (the
    information the reference's 3-D conv stack extracts from its 41-deep
    z axis, computed in closed form) — via exactly ONE binned reduction.
    All statistics are sums (the occupancy histogram rides a z-bin one-hot,
    z spread comes from the (z, z^2) moments), so they share a single
    (P, 1+C+1+n_z_bins)-channel bin-sum: scatter/update cost on TPU is per
    update row, so one wide reduction is ~3x cheaper than the naive
    count/mean/max/histogram formulation.  The reduction itself uses the
    Pallas one-hot-matmul binning kernel (ops/pallas_bin.py) where available
    and falls back to an XLA segment-sum."""
    from ..ops.pallas_bin import bin_sum

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
    z = points[:, 2]
    zbin = jnp.clip(((z - z_lo) / (z_hi - z_lo) * n_z_bins).astype(jnp.int32),
                    0, n_z_bins - 1)
    data = jnp.concatenate([
        jnp.ones((points.shape[0], 1), jnp.float32),      # count
        points,                                           # feature sums
        (z * z)[:, None],                                 # z second moment
        jax.nn.one_hot(zbin, n_z_bins, dtype=jnp.float32),  # z occupancy
    ], axis=-1)
    data = jnp.where(inb[:, None], data, 0.0)

    if layout == 'cf':
        feats = bin_sum(data, pid, n_bins=n_pillars + 1,
                        finalize=_pillar_finalize(points.shape[1]),
                        out_dtype=out_dtype, exact=False,
                        presorted=presorted,
                        transposed_out=True)[:, :n_pillars]
        return feats.reshape(-1, nx, ny)
    feats = bin_sum(data, pid, n_bins=n_pillars + 1,
                    finalize=_pillar_finalize(points.shape[1]),
                    out_dtype=out_dtype, exact=False,
                    presorted=presorted)[:n_pillars]
    return feats.reshape(nx, ny, -1)


def pillarize_batch(points: jnp.ndarray, point_mask: jnp.ndarray,
                    point_cloud_range, voxel_size, n_z_bins: int = 8,
                    out_dtype=jnp.float32, presorted: bool = False):
    """Batched pillarize: (B, P, C) -> (B, F, nx, ny) in ONE kernel launch.

    Clouds are concatenated with per-cloud bin offsets that are multiples
    of the kernel's BINS_PER_TILE, so tiles never straddle clouds and the
    per-cloud tile-sorted order (MODEL.LIDAR.TILE_SORTED_POINTS) remains
    globally sorted.  One launch instead of B: on this runtime per-call
    dispatch overhead is a first-class cost (docs/PERF.md round 4), and
    the B x 80k-row reduction amortises the grid the same way."""
    from ..ops.pallas_bin import BINS_PER_TILE, bin_sum

    B, P, C = points.shape
    pc = jnp.asarray(point_cloud_range, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    nx = int(round(float((point_cloud_range[3] - point_cloud_range[0])
                         / voxel_size[0])))
    ny = int(round(float((point_cloud_range[4] - point_cloud_range[1])
                         / voxel_size[1])))
    z_lo, z_hi = float(point_cloud_range[2]), float(point_cloud_range[5])
    n_pillars = nx * ny
    per_cloud = -(-(n_pillars + 1) // BINS_PER_TILE) * BINS_PER_TILE

    flat = points.reshape(B * P, C)
    fmask = point_mask.reshape(B * P)
    cx = jnp.floor((flat[:, 0] - pc[0]) / vs[0]).astype(jnp.int32)
    cy = jnp.floor((flat[:, 1] - pc[1]) / vs[1]).astype(jnp.int32)
    inb = ((cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny)
           & (flat[:, 2] >= z_lo) & (flat[:, 2] < z_hi) & fmask)
    base = (jnp.arange(B, dtype=jnp.int32) * per_cloud
            ).repeat(P)                                  # (B*P,)
    pid = base + jnp.where(inb, cx * ny + cy, n_pillars)

    z = flat[:, 2]
    zbin = jnp.clip(((z - z_lo) / (z_hi - z_lo) * n_z_bins).astype(jnp.int32),
                    0, n_z_bins - 1)
    data = jnp.concatenate([
        jnp.ones((flat.shape[0], 1), jnp.float32),
        flat,
        (z * z)[:, None],
        jax.nn.one_hot(zbin, n_z_bins, dtype=jnp.float32),
    ], axis=-1)
    data = jnp.where(inb[:, None], data, 0.0)

    feats = bin_sum(data, pid, n_bins=B * per_cloud,
                    finalize=_pillar_finalize(C), out_dtype=out_dtype,
                    exact=False, presorted=presorted, transposed_out=True)
    f = feats.shape[0]
    feats = feats.reshape(f, B, per_cloud)[:, :, :n_pillars]
    return jnp.transpose(feats, (1, 0, 2)).reshape(B, f, nx, ny)


# Lowering for the ladder's 3x3 convs: 'xla' (native conv) or 'taps'
# (9 shifted matmuls — same params/paths, identical numerics; see
# layers/conv.py::DilatedConv3x3).  XLA convs at the 400^2 / 64-out shapes
# measure 7-16 % MXU utilisation; the microbench
# (tools/exp_pillar_convforms.py) decides the default on TPU.
PILLAR_CONV_BACKEND = os.environ.get('STREAMINGFLOW_PILLAR_CONV', 'xla')

# 'loop' (per-cloud kernel launches) or 'batch' (one launch, per-cloud bin
# offsets).  Judge A/B round 4: loop 10.05 vs batch 9.19 forecasts/s at
# flagship shape on v5e — the batched variant's padded (B*per_cloud) bin
# axis costs more than the saved dispatches.  Re-A/B with
# STREAMINGFLOW_PILLARIZE=batch when the runtime's dispatch cost changes.
PILLARIZE_BACKEND = os.environ.get('STREAMINGFLOW_PILLARIZE', 'loop')


class ConvBNReLU(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        if PILLAR_CONV_BACKEND == 'taps':
            from ..layers.conv import DilatedConv3x3
            x = DilatedConv3x3(self.features, stride=self.stride,
                               name='Conv_0')(x)
        else:
            x = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                        padding=[(1, 1)] * 2, use_bias=False,
                        name='Conv_0')(x)
        # reference BN eps 1e-3 / momentum 0.01 (sparse_encoder.py:39-40)
        x = nn.BatchNorm(momentum=0.99, epsilon=1e-3,
                         use_running_average=not train)(x)
        return nn.relu(x)


class PillarBEVEncoder(nn.Module):
    """points (B, T, P, 5) -> BEV features (B, T, X/8, Y/8, 2*out_channels).

    ``tile_sorted``: the loader guarantees bin-tile-grouped point order
    (MODEL.LIDAR.TILE_SORTED_POINTS) — skips the device-side sort."""
    cfg: SparseEncoderConfig
    n_z_bins: int = 8
    tile_sorted: bool = False

    @nn.compact
    def __call__(self, points, train: bool = False):
        cfg = self.cfg
        B, T, P, C = points.shape
        flat = points.reshape(B * T, P, C)
        pmask = jnp.any(flat[..., :3] != 0, axis=-1)

        # Two equivalent formulations (A/B'd on the v5e each round —
        # docs/PERF.md): 'loop' launches the binning kernel per cloud
        # (XLA compiles the identical body once); 'batch' concatenates
        # clouds with per-cloud bin offsets at tile granularity for ONE
        # launch.  bf16 straight out of the kernel epilogue: HBM traffic
        # dominates this branch.  Channel-first layout: transposing the
        # kernel's (F, bins) output at F=15 wastes 7/8 of each lane tile
        # (~17 ms at 1600^2); the space-to-depth below transposes once at
        # 240 channels instead, where lanes are full.
        if PILLARIZE_BACKEND == 'batch':
            h = pillarize_batch(flat, pmask, cfg.POINT_CLOUD_RANGE,
                                cfg.VOXEL_SIZE, self.n_z_bins,
                                out_dtype=jnp.bfloat16,
                                presorted=self.tile_sorted)
        else:
            h = jnp.stack([
                pillarize(flat[i], pmask[i], cfg.POINT_CLOUD_RANGE,
                          cfg.VOXEL_SIZE, self.n_z_bins,
                          out_dtype=jnp.bfloat16,
                          presorted=self.tile_sorted, layout='cf')
                for i in range(B * T)])                   # (BT, F, nx, ny)

        # Space-to-depth 4x straight out of the pillar grid: at 0.0625 m the
        # active density is ~0.3%, so dense full-res convs would do ~300x
        # the useful work.  Folding 4x4 patches into channels preserves the
        # information losslessly and lands the convs at 400^2 with
        # MXU-friendly channel counts.  Channel order (sx*4+sy)*F + c —
        # identical to the former NHWC moveaxis formulation, so weights are
        # interchangeable.
        bt, f, nx, ny = h.shape
        s = 4
        h = h.reshape(bt, f, nx // s, s, ny // s, s)
        h = jnp.transpose(h, (0, 2, 4, 3, 5, 1)).reshape(
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
        # emit the branch compute dtype: a fp32 cast here would promote the
        # LiDAR temporal model AND (via the observation merge) the whole
        # GRU-ODE/refinement stack to fp32 under mixed-precision runs.
        # COMPUTE_DTYPE='bfloat16' keeps that true with fp32 points (which
        # must NOT be bf16-cast — voxel binning is precision-sensitive).
        out_dtype = (jnp.dtype(cfg.COMPUTE_DTYPE)
                     if cfg.COMPUTE_DTYPE != 'auto' else points.dtype)
        h = nn.relu(h).astype(out_dtype)
        return h.reshape(B, T, *h.shape[1:])
