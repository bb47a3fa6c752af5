"""LiDAR branch: voxelize + sparse "spconv8x" encoder -> dense BEV features.

TPU-native equivalent of the reference pipeline
streamingflow/models/streamingflow.py:170-233 (hard voxelize + mean reduce)
-> mmdet3d/models/backbones/sparse_encoder.py:11-133 (SparseEncoder,
block_type='basicblock', encoder_channels [[16,16,32],[32,32,64],
[64,64,128],[128,128]], strided SparseConv3d between stages, conv_out
(1,1,3)/(1,1,2) -> dense (200,200,2,128) -> 256-channel BEV map).

Sparse tensors ride the static-capacity slot representation of
ops/sparse.py; batch (B*T point clouds) is a vmapped leading axis; batch
norm runs over all active voxels of all clouds (masked), matching torch
BN1d over the concatenated voxel set (norm eps 1e-3, momentum 0.01,
sparse_encoder.py:39).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import SparseEncoderConfig
from ..ops import sparse as S
from ..ops import sparse_tiled as tileops
from ..ops.voxelize import voxelize


class MaskedBatchNorm(nn.Module):
    """BatchNorm over (..., V, C) sparse features with a validity mask.

    torch BN1d semantics: eps 1e-3, momentum 0.01 (running = 0.99*old +
    0.01*batch), biased batch var for normalisation, unbiased for the
    running update."""
    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        c = x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))

        if train:
            m = mask[..., None].astype(x.dtype)
            n = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x * m, axis=tuple(range(x.ndim - 1))) / n
            var = jnp.sum(((x - mean) ** 2) * m,
                          axis=tuple(range(x.ndim - 1))) / n
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return jnp.where(mask[..., None], y, 0.0)


def _batched_nmap(coords, ids, mask, shape):
    """One 27-tap neighbour map per cloud, shared by every subm conv of the
    stage (spconv caches indice pairs the same way, ops.py:45-126)."""
    def one(c, i, m):
        st = S.SparseTensor(jnp.zeros((i.shape[0], 1)), c, i, m, shape)
        return S.build_neighbor_map(st, 3)
    return jax.vmap(one)(coords, ids, mask)


def _batched_tmap(coords, ids, mask, shape, cap_tiles, tile):
    """One occupied-tile map per cloud (tiled engine's stage cache)."""
    return jax.vmap(lambda c, i, m: tileops.build_tile_map(
        c, i, m, shape, cap_tiles, tile=tile))(coords, ids, mask)


def _batched_subm(feats, mask, geo, weights):
    """Submanifold conv batched over clouds; `geo` selects the engine.

    TileMap: `feats` is the dense tile tensor (B, T_cap, tx, ty, tz, C)
    — halo exchange + one dense conv on the MXU; padded cells pick up
    neighbourhood sums but the masked BN that always follows zeroes
    them, so tile residency across a whole stage is exact.
    NeighborMap: compact (B, V, C) row-gather GEMM."""
    if isinstance(geo, tileops.TileMap):
        return jax.vmap(lambda tl, g: tileops.subm_conv_tiles(tl, g, weights))(
            feats, geo)
    return jax.vmap(lambda f, m, nm: S.gather_gemm(f, nm, weights, m))(
        feats, mask, geo)


def _batched_sparse_conv(feats, coords, ids, mask, shape, weights, kernel,
                         stride, padding, cap):
    def one(f, c, i, m):
        st = S.SparseTensor(f, c, i, m, shape)
        out = S.sparse_conv3d(st, weights, kernel, stride, padding, cap)
        return out.feats, out.coords, out.ids, out.mask
    out = jax.vmap(one)(feats, coords, ids, mask)
    out_shape = tuple((shape[d] + 2 * padding[d] - kernel[d]) // stride[d] + 1
                      for d in range(3))
    return (*out, out_shape)


class SubMConvBNReLU(nn.Module):
    out_channels: int
    kernel: int = 3

    @nn.compact
    def __call__(self, feats, mask, nmap, train: bool = False):
        k3 = self.kernel ** 3
        w = self.param('kernel', nn.initializers.variance_scaling(
            1.0, 'fan_in', 'uniform'),
            (k3, feats.shape[-1], self.out_channels))
        h = _batched_subm(feats, mask, nmap, w)
        h = MaskedBatchNorm()(h, mask, train=train)
        return nn.relu(h)


class SparseBasicBlock(nn.Module):
    """Residual block of two subm convs (mmdet3d/ops/sparse_block.py:62)."""
    channels: int

    @nn.compact
    def __call__(self, feats, mask, nmap, train: bool = False):
        identity = feats
        w1 = self.param('kernel1', nn.initializers.variance_scaling(
            1.0, 'fan_in', 'uniform'), (27, feats.shape[-1], self.channels))
        h = _batched_subm(feats, mask, nmap, w1)
        h = MaskedBatchNorm(name='bn1')(h, mask, train=train)
        h = nn.relu(h)
        w2 = self.param('kernel2', nn.initializers.variance_scaling(
            1.0, 'fan_in', 'uniform'), (27, self.channels, self.channels))
        h = _batched_subm(h, mask, nmap, w2)
        h = MaskedBatchNorm(name='bn2')(h, mask, train=train)
        return nn.relu(h + identity)


class SparseConvBNReLU(nn.Module):
    """Strided sparse conv + BN + ReLU producing a new active set.

    When `geo` (a batched TileMap) is given, `feats` is the stage's
    resident tile tensor and the conv runs densely on the tiles
    (ops/sparse_tiled.py::sparse_conv_tiles); the compact output rows
    come back through one gather.  Parameters are identical either way."""
    out_channels: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    cap: int

    @nn.compact
    def __call__(self, feats, coords, ids, mask, shape, train: bool = False,
                 geo=None):
        kprod = self.kernel[0] * self.kernel[1] * self.kernel[2]
        cin = feats.shape[-1]
        w = self.param('kernel', nn.initializers.variance_scaling(
            1.0, 'fan_in', 'uniform'), (kprod, cin, self.out_channels))
        if geo is not None:
            out_shape = tuple(
                (shape[d] + 2 * self.padding[d] - self.kernel[d])
                // self.stride[d] + 1 for d in range(3))

            def one(tl, g, c, i, m):
                st = S.SparseTensor(jnp.zeros((i.shape[0], 1)), c, i, m,
                                    shape)
                (oi, oc, om), src = S.generate_output_sites(
                    st, self.kernel, self.stride, self.padding, out_shape,
                    self.cap, return_src=True)
                of = tileops.sparse_conv_tiles(
                    tl, g, c, w, self.kernel, self.stride, self.padding,
                    oc, om, src)
                return of, oc, oi, om

            feats, coords, ids, mask = jax.vmap(one)(feats, geo, coords,
                                                     ids, mask)
            shape = out_shape
        else:
            feats, coords, ids, mask, shape = _batched_sparse_conv(
                feats, coords, ids, mask, shape, w, self.kernel, self.stride,
                self.padding, self.cap)
        feats = MaskedBatchNorm()(feats, mask, train=train)
        return nn.relu(feats), coords, ids, mask, shape


class LidarBEVEncoder(nn.Module):
    """points (B, T, P, 5) -> BEV features (B, T, X, Y, 2*output_channels)."""
    cfg: SparseEncoderConfig

    @nn.compact
    def __call__(self, points, train: bool = False):
        cfg = self.cfg
        B, T, P, C = points.shape
        flat_pts = points.reshape(B * T, P, C)
        # padded points are all-zero rows (reference pads with zeros,
        # NuscenesData.py:869-873, which its CUDA voxelizer also bins)
        pt_mask = jnp.any(flat_pts[..., :3] != 0, axis=-1)

        vox = jax.vmap(functools.partial(
            voxelize, point_cloud_range=cfg.POINT_CLOUD_RANGE,
            voxel_size=cfg.VOXEL_SIZE, max_points=cfg.MAX_NUM_POINTS,
            max_voxels=cfg.MAX_VOXELS))(flat_pts, pt_mask)
        feats, coords, mask = vox.feats, vox.coords, vox.mask
        shape = tuple(cfg.SPARSE_SHAPE)
        # Re-linearise ids into the SPARSE_SHAPE id space (the reference's
        # sparse_shape pads z by +1 over the voxel grid, sparse_encoder
        # convention); lexicographic order — and thus sortedness — is
        # preserved.
        from ..ops.voxelize import LARGE_ID, linearize
        ids = jnp.where(mask, linearize(coords, shape), LARGE_ID)

        # conv_input (sparse_encoder.py:74-82): the stage geometry cache
        # (27-tap neighbour map, or occupied-tile map for the tiled
        # engine) is built once per stage and reused by every subm conv
        # on that active set.  Under the tiled engine, features stay
        # RESIDENT in the dense tile tensor across the whole stage —
        # one scatter in, one gather out per stage; BN runs masked on
        # the tiles (same stats: padded cells are zero and excluded).
        tiled = cfg.ENGINE == 'tiled'

        tile = tuple(cfg.TILE_SHAPE)

        def make_geo(coords, ids, mask, shape, stage):
            if tiled:
                n_tiles = 1
                for d in range(3):
                    n_tiles *= -(-shape[d] // tile[d])
                cap = min(cfg.TILE_CAPS[stage], n_tiles)
                return _batched_tmap(coords, ids, mask, shape, cap, tile)
            return _batched_nmap(coords, ids, mask, shape)

        def enter_stage(feats, mask, geo):
            if tiled:
                return (jax.vmap(tileops.to_tiles)(feats, geo, mask),
                        geo.occupancy)
            return feats, mask

        geo = make_geo(coords, ids, mask, shape, 0)
        sfeats, smask = enter_stage(feats, mask, geo)
        sfeats = SubMConvBNReLU(cfg.BASE_CHANNELS, name='conv_input')(
            sfeats, smask, geo, train=train)

        # downsamples consume the resident tiles directly (geo!=None) and
        # emit compact rows, so tiled stages flow tile->tile with no
        # compact round-trip anywhere inside the ladder
        stage_paddings = [(1, 1, 1), (1, 1, 1), (1, 1, 0)]
        for i, blocks in enumerate(cfg.ENCODER_CHANNELS):
            for j, ch in enumerate(blocks):
                last = j == len(blocks) - 1
                if last and i != len(cfg.ENCODER_CHANNELS) - 1:
                    feats, coords, ids, mask, shape = SparseConvBNReLU(
                        ch, (3, 3, 3), (2, 2, 2), stage_paddings[i],
                        cap=cfg.STAGE_CAPS[i + 1],
                        name=f'down{i + 1}')(sfeats, coords, ids, mask,
                                             shape, train=train,
                                             geo=geo if tiled else None)
                    geo = make_geo(coords, ids, mask, shape, i + 1)
                    sfeats, smask = enter_stage(feats, mask, geo)
                else:
                    sfeats = SparseBasicBlock(
                        ch, name=f'stage{i + 1}_block{j}')(
                        sfeats, smask, geo, train=train)

        # conv_out: kernel (1,1,3) stride (1,1,2) pad 0 (sparse_encoder.py:88-97)
        feats, coords, ids, mask, shape = SparseConvBNReLU(
            cfg.OUTPUT_CHANNELS, (1, 1, 3), (1, 1, 2), (0, 0, 0),
            cap=cfg.STAGE_CAPS[-1], name='conv_out')(
            sfeats, coords, ids, mask, shape, train=train,
            geo=geo if tiled else None)

        # densify: (nx, ny, nz, C) -> (nx, ny, nz*C) with channel = c*nz + z
        # (reference reshape semantics, sparse_encoder.py:126-133)
        def densify(f, c, i, m):
            st = S.SparseTensor(f, c, i, m, shape)
            return S.to_dense(st)

        dense = jax.vmap(densify)(feats, coords, ids, mask)
        nx, ny, nz = shape
        dense = jnp.swapaxes(dense, -1, -2).reshape(B, T, nx, ny, -1)
        return dense
